package graft.operators

import graft.SparkSpec

/** The RangeJoin fail-fast guards (advisor round-2 findings): bounds
  * beyond 2^53 would silently coarsen double-division buckets, and a
  * degenerate huge interval would explode into millions of bucket rows —
  * both must raise with an actionable message, not corrupt or crawl. */
class RangeJoinGuardSpec extends SparkSpec {
  import spark.implicits._

  private def left(rows: (Long, Long, Long)*) = rows.toDF("a_id", "a_lo", "a_hi")
  private def right(rows: (Long, Long, Long)*) = rows.toDF("b_id", "b_lo", "b_hi")

  test("bounds beyond 2^53 fail fast with the rescale hint") {
    val l = left((1L, (1L << 53) + 10L, (1L << 53) + 20L)) // nanosecond-epoch scale
    val r = right((1L, 0L, 100L))
    val e = intercept[Exception] {
      RangeJoin.overlapJoin(l, r, "a_lo", "a_hi", "b_lo", "b_hi", width = 10).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("rescale"),
      s"expected the rescale hint, got: ${e.getMessage}")
  }

  test("a degenerate huge interval fails fast instead of exploding") {
    val l = left((1L, 0L, 10L))
    val r = right((1L, 0L, Int.MaxValue.toLong)) // ~2^31 buckets at width 10
    val e = intercept[Exception] {
      RangeJoin.overlapJoin(l, r, "a_lo", "a_hi", "b_lo", "b_hi", width = 10).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("raise width") || e.getMessage.contains("buckets")),
      s"expected the fan-out guard, got: ${e.getMessage}")
  }

  test("NULL bounds drop the row, not raise (pre-guard explode semantics)") {
    // advisor round-4 finding: when(abs(NULL) < 2^53) is NULL, which fell
    // through to otherwise(raise_error) — a nullable bound column killed
    // the job with a misleading "rescale" message.
    val l = Seq(
      (1L, Some(5L), Some(15L)),   // normal — must still match
      (2L, None, Some(15L)),       // null lo — dropped
      (3L, Some(5L), None),        // null hi — dropped
      (4L, None, None)             // both null — dropped
    ).toDF("a_id", "a_lo", "a_hi")
    val r = Seq((7L, Some(10L), Some(12L))).toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.overlapJoin(l, r, "a_lo", "a_hi", "b_lo", "b_hi", width = 8)
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.toSeq == Seq((1L, 7L)))
  }

  test("in-range inputs still join exactly (guards are inert on the happy path)") {
    val l = left((1L, 5L, 15L))
    val r = right((7L, 10L, 12L))
    val got = RangeJoin.overlapJoin(l, r, "a_lo", "a_hi", "b_lo", "b_hi", width = 8)
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.toSeq == Seq((1L, 7L)))
  }
}
