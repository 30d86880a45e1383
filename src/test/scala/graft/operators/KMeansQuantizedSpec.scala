package graft.operators

import graft.SparkSpec

class KMeansQuantizedSpec extends SparkSpec {
  import spark.implicits._

  private def fit(pts: Seq[(Long, Seq[Long])], k: Int, iters: Int) =
    KMeansQuantized.fit(pts.toDF("vec_id", "q"), k, iters)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap

  test("two obvious blobs converge to their exact integer means") {
    // blob A around (0,0): ids 1-3; blob B around (1000,1000): ids 4-6.
    // Seeds are ids 1,2 (both in blob A); round 2 separates the blobs and
    // the centroids land on the truncating integer means:
    // A = (10 div 3, 10 div 3) = (3,3); B = (3010 div 3, ...) = (1003,1003)
    val pts = Seq(
      1L -> Seq(0L, 0L), 2L -> Seq(10L, 0L), 3L -> Seq(0L, 10L),
      4L -> Seq(1000L, 1000L), 5L -> Seq(1010L, 1000L), 6L -> Seq(1000L, 1010L))
    val got = fit(pts, 2, 3)
    assert(got((0, 0L)) == (3L, 3L) && got((0, 1L)) == (3L, 3L))
    assert(got((1, 0L)) == (1003L, 3L) && got((1, 1L)) == (1003L, 3L))
  }

  test("deterministic under repartitioning") {
    val pts = (1L to 40L).map(i => i -> Seq(i * 7 % 13, i * 11 % 17, i * 3 % 5))
    def run(parts: Int) =
      KMeansQuantized.fit(pts.toDF("vec_id", "q").repartition(parts), 3, 4)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(1) == run(7))
  }

  test("distance ties break to the lower cid; an emptied cluster keeps coords") {
    // coinciding seeds (ids 1,2 both at 5): every point ties between the
    // two centroids, the cid tiebreak sends ALL to cluster 0, cluster 1
    // empties and must retain its seed coordinate with size 0
    val pts = Seq(1L -> Seq(5L), 2L -> Seq(5L), 3L -> Seq(6L))
    val got = fit(pts, 2, 2)
    assert(got((0, 0L)) == (5L, 3L)) // 16 div 3 = 5
    assert(got((1, 0L)) == (5L, 0L))
  }
}
