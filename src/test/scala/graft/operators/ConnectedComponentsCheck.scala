package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check: ConnectedComponents.label agrees with an in-memory
  * union-find on random sparse graphs (the obviously-correct reference),
  * including graphs with long paths — the worst case for the star
  * contraction's round count.
  */
object ConnectedComponentsCheck extends Properties("graft.operators.ConnectedComponents") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.toList.map(k => k -> find(k)).toMap
  }

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 60) // node id space; small => dense collisions
    m <- Gen.choose(1, 80)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong)
    } yield (a, b))
  } yield edges

  property("== union-find on random graphs") = forAll(genEdges) { edges =>
    import spark.implicits._
    val got = ConnectedComponents.label(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // union-find keys include self-loop-only nodes; the operator drops
    // self-loops entirely, so restrict the reference to real-edge nodes
    val realNodes = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e._1, e._2)).toSet
    val want = unionFind(edges.filter(e => e._1 != e._2))
      .filter { case (k, _) => realNodes.contains(k) }
    got == want
  }
}
