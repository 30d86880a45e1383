package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory power-iteration reference with identical semantics. */
  private def reference(
      edges: Seq[(Long, Long)], iters: Int, d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0).toMap
    (1 to iters).foreach { _ =>
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val contribs = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(v =>
        v -> ((1 - d) + d * dangling / n + d * contribs.getOrElse(v, 0.0))).toMap
    }
    r
  }

  private val chainWithHub = Seq( // 1→2→3, hub 4→{1,2,3}, 3 dangling? no: 3→4
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 2L), (4L, 3L))

  test("matches the power-iteration reference on a small graph") {
    val got = PageRank.ranks(chainWithHub.toDF("s", "t"), "s", "t", iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = reference(chainWithHub, 8)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9, s"node $k: $v vs ${want(k)}")
    }
  }

  test("rank mass is conserved at n, with dangling nodes") {
    // node 3 has no out-edges -> dangling redistribution path exercised
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val ranks = PageRank.ranks(edges.toDF("s", "t"), "s", "t", iterations = 12)
    val total = ranks.agg(sum(col("rank"))).head.getDouble(0)
    assert(math.abs(total - 3.0) < 1e-9, s"mass $total")
    val want = reference(edges, 12)
    ranks.collect().foreach(r =>
      assert(math.abs(r.getDouble(1) - want(r.getLong(0))) < 1e-9))
  }

  test("quantized ranks track the double ranks within quantization error") {
    val got = PageRank.ranksQuantized(chainWithHub.toDF("s", "t"), "s", "t", iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = reference(chainWithHub, 8)
    assert(got.keySet == want.keySet)
    // floor losses accumulate at most ~iters·deg units of 1e-9
    got.foreach { case (k, s) =>
      assert(math.abs(s / 1e9 - want(k)) < 1e-6, s"node $k: $s vs ${want(k)}")
    }
  }

  test("quantized ranks are bit-identical under repartitioning, incl. dangling") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)) // node 3 dangling
    def run(parts: Int) =
      PageRank.ranksQuantized(edges.toDF("s", "t").repartition(parts), "s", "t", 12)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val a = run(1)
    assert(a == run(7))
    val want = reference(edges, 12)
    a.foreach { case (k, s) => assert(math.abs(s / 1e9 - want(k)) < 1e-6) }
  }

  test("linked-to pages outrank unlinked ones; symmetric pages tie exactly") {
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (9L, 1L))
    val ranks = PageRank.ranks(star.toDF("s", "t"), "s", "t", iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 9 is linked by everyone and 1 receives 9's whole mass: both far above
    // the unlinked 2/3/4 (which tie bit-exactly by symmetry)
    assert(ranks(9L) > ranks(2L) && ranks(1L) > ranks(2L))
    assert(ranks(2L) == ranks(3L) && ranks(3L) == ranks(4L))
  }

  test("deterministic across partitionings") {
    val edges = (1L to 60L).map(i => (i, i * 7 % 60 + 1))
    val a = PageRank.ranks(edges.toDF("s", "t").repartition(1), "s", "t", 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = PageRank.ranks(edges.toDF("s", "t").repartition(13), "s", "t", 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // double addition order may differ across partitionings: allow 1e-12
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }
}
