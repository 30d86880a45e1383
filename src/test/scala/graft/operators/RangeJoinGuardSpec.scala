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

  test("in-range inputs still join exactly (guards are inert on the happy path)") {
    val l = left((1L, 5L, 15L))
    val r = right((7L, 10L, 12L))
    val got = RangeJoin.overlapJoin(l, r, "a_lo", "a_hi", "b_lo", "b_hi", width = 8)
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.toSeq == Seq((1L, 7L)))
  }
}
