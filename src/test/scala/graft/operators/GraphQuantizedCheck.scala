package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check for the quantized centralities: random digraphs, full
  * integer equality against independent BigInt references (no shared code
  * with the operators), including the dangling / no-in-edge structure a
  * hand-picked fixture can miss.
  */
object GraphQuantizedCheck extends Properties("graft.operators.GraphQuantized") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.SparkSpec.session
  private val Unit9 = 1000000000L

  // small node space → dense structure: self-loops, parallel-edge dedup is
  // NOT applied (operators count multi-edges), dangling nodes all arise
  private val genEdges: Gen[List[(Long, Long)]] = Gen.listOfN(14, for {
    s <- Gen.choose(1L, 6L)
    t <- Gen.choose(1L, 7L)
  } yield (s, t)).suchThat(_.nonEmpty)

  private def refPageRank(edges: List[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var s = nodes.map(_ -> Unit9).toMap
    (1 to iters).foreach { _ =>
      val dangling = nodes.filterNot(deg.contains).map(s).sum
      val share = dangling / n
      val contrib = edges.groupBy(_._2).view
        .mapValues(_.map { case (u, _) => s(u) / deg(u) }.sum).toMap
      s = nodes.map(v =>
        v -> (15L * Unit9 + 85L * (contrib.getOrElse(v, 0L) + share)) / 100L).toMap
    }
    s
  }

  private def refHits(edges: List[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> Unit9).toMap
    var auth = nodes.map(_ -> Unit9).toMap
    (1 to iters).foreach { _ =>
      val rawA = edges.groupBy(_._2).view.mapValues(_.map(e => hub(e._1)).sum).toMap
      val maxA = rawA.values.max
      auth = nodes.map(v => v -> (BigInt(rawA.getOrElse(v, 0L)) * Unit9 / maxA).toLong).toMap
      val rawH = edges.groupBy(_._1).view.mapValues(_.map(e => auth(e._2)).sum).toMap
      val maxH = rawH.values.max
      hub = nodes.map(v => v -> (BigInt(rawH.getOrElse(v, 0L)) * Unit9 / maxH).toLong).toMap
    }
    nodes.map(v => v -> (hub(v), auth(v))).toMap
  }

  property("quantized PageRank equals the integer reference on random digraphs") =
    forAll(genEdges, Gen.choose(1, 5)) { (edges, iters) =>
      import spark.implicits._
      val got = PageRank.ranksQuantized(edges.toDF("s", "t"), "s", "t", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == refPageRank(edges, iters)
    }

  property("quantized HITS equals the BigInt reference on random digraphs") =
    forAll(genEdges, Gen.choose(1, 4)) { (edges, iters) =>
      import spark.implicits._
      val got = Hits.hubsAndAuthorities(edges.toDF("s", "t"), "s", "t", iters)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      got == refHits(edges, iters)
    }
}
