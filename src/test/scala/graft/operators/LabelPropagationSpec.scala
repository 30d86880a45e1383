package graft.operators

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {

  /** Independent in-memory reference: symmetrize, then k synchronous
    * rounds of neighbor-majority (count desc, label asc) — the same
    * contract the operator states, derived with plain Scala collections. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(e => e._1 != e._2).distinct
    val nodes = sym.map(_._1).distinct
    val inNbrs = sym.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var lbl = nodes.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      val prev = lbl
      lbl = nodes.map { n =>
        val votes = inNbrs(n).map(prev).groupBy(identity).view.mapValues(_.size.toLong)
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    lbl
  }

  private def run(edges: Seq[(Long, Long)], iters: Int, parts: Int): Map[Long, Long] = {
    import spark.implicits._
    LabelPropagation.propagate(
        edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the in-memory reference on a random graph, any partitioning") {
    val rnd = new scala.util.Random(1234)
    val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val want = reference(edges, iters = 3)
    assert(run(edges, 3, parts = 1) == want)
    assert(run(edges, 3, parts = 11) == want)
  }

  test("two cliques joined by one bridge resolve to two communities") {
    def clique(ids: Seq[Long]): Seq[(Long, Long)] =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 10L))
    val got = run(edges, 4, parts = 3)
    assert(got == reference(edges, 4))
    // the two cliques must NOT share a label (density beats the weak link —
    // exactly what distinguishes LPA from connected components, which would
    // merge everything through the bridge)
    val left = Seq(1L, 2L, 3L).map(got).toSet
    val right = Seq(11L, 12L, 13L).map(got).toSet
    assert(left.size == 1 && right.size == 1 && left != right)
  }

  test("self-loops and duplicate edges are ignored") {
    val base = Seq((1L, 2L), (2L, 3L))
    val noisy = base ++ Seq((1L, 1L), (2L, 2L), (1L, 2L), (2L, 1L))
    assert(run(noisy, 2, parts = 2) == run(base, 2, parts = 2))
  }

  test("rejects iters < 1") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      LabelPropagation.propagate(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 0)
    }
  }
}
