package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  /** Independent in-memory reference: symmetrize, then `rounds` synchronous
    * peels at threshold k — each node tagged with the round that removed it
    * (0 = survivor) and the surviving-subgraph degree that decided it. */
  private def reference(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, (Long, Long)] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(e => e._1 != e._2).distinct
    var alive = sym.map(_._1).toSet
    var out = Map.empty[Long, (Long, Long)]
    var lastDeg = Map.empty[Long, Long]
    (1 to rounds).foreach { i =>
      val deg = sym.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).view.mapValues(_.size.toLong).toMap
      lastDeg = alive.map(n => n -> deg.getOrElse(n, 0L)).toMap
      val (dead, live) = alive.partition(n => lastDeg(n) < k)
      out ++= dead.map(n => n -> (i.toLong, lastDeg(n)))
      alive = live
    }
    out ++ alive.map(n => n -> (0L, lastDeg(n)))
  }

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int, parts: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    KCore.peel(edges.toDF("src", "dst").repartition(parts), "src", "dst", k, rounds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("matches the in-memory reference on a random graph, any partitioning") {
    val rnd = new scala.util.Random(77)
    val edges = Seq.fill(500)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2)
    val want = reference(edges, k = 8, rounds = 4)
    assert(run(edges, 8, 4, parts = 1) == want)
    assert(run(edges, 8, 4, parts = 13) == want)
  }

  test("cascade peels a chain hanging off a clique, round by round") {
    // 5-clique (2-core survivors) + a path 100-101-102 hanging off node 0:
    // 102 has degree 1 → removed round 1; its removal drops 101 to 1 →
    // round 2; then 100 → round 3; the clique never drops below 4.
    val clique = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = Seq((0L, 100L), (100L, 101L), (101L, 102L))
    val got = run(clique ++ chain, k = 2, rounds = 4, parts = 3)
    assert(got(102L) == (1L, 1L))
    assert(got(101L) == (2L, 1L))
    assert(got(100L) == (3L, 1L))
    (0L to 4L).foreach { n => assert(got(n)._1 == 0L, s"clique node $n peeled") }
  }

  test("every node is reported exactly once") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    import spark.implicits._
    val df = KCore.peel(edges.toDF("src", "dst"), "src", "dst", 6, 3)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.size
    assert(df.count() == nodes)
    assert(df.select("node").distinct().count() == nodes)
  }
}
