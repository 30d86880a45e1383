package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.label(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 10-node chain collapses to one component rooted at the minimum") {
    val m = labelsOf((1L to 9L).map(i => (i, i + 1)))
    assert(m.keySet == (1L to 10L).toSet)
    assert(m.values.toSet == Set(1L))
  }

  test("disjoint components keep distinct minimum-id labels") {
    // component {1,2,3} via a path, {10,11} via one edge, {20,21,22} as a
    // triangle; edge direction and duplication must not matter
    val m = labelsOf(Seq((3L, 2L), (2L, 1L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("self-loops and nulls are dropped, not labeled") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (5L, 5L), (null, 7L), (1L, 2L)).toDF("a", "b")
    val m = ConnectedComponents.label(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L))
  }

  test("a 100-node path converges within the O(log n) round budget") {
    val m = labelsOf((0L until 100L).map(i => (i, i + 1)))
    assert(m.size == 101 && m.values.forall(_ == 0L))
  }

  test("star-forest invariant: every label is the component minimum (bridge graph)") {
    // two cliques bridged by one edge — the shape LSH clusters actually take
    val c1 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val c2 = for (i <- 30L to 34L; j <- (i + 1) to 34L) yield (i, j)
    val m = labelsOf(c1 ++ c2 ++ Seq((5L, 30L)))
    assert(m.keySet == ((1L to 5L) ++ (30L to 34L)).toSet)
    assert(m.values.toSet == Set(1L))
  }
}
