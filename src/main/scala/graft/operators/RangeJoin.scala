package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-large interval overlap join via bucketization — the range-join
  * scale path when NEITHER side broadcasts (the broadcast case is a plain
  * theta join, cf. catalog `x2_range_band_join`).
  *
  * A naive `a.lo <= b.hi AND b.lo <= a.hi` join has no equi key, which
  * Spark plans as a nested-loop cross product — quadratic, fatal at scale.
  * Bucketizing maps each interval to the fixed-width buckets it touches
  * (`floor(lo/W) .. floor(hi/W)`), joins on bucket equality (an ordinary
  * shuffled hash/sort-merge join), and applies the exact overlap predicate
  * inside the bucket. Each overlapping pair would match in every shared
  * bucket, so the join keeps it only in ONE canonical bucket — the bucket
  * of `greatest(a.lo, b.lo)`, which overlap guarantees both sides touch —
  * making the output exactly-once with NO distinct pass.
  *
  * Cost: |A|·avg_buckets + |B|·avg_buckets shuffled rows and per-bucket
  * products — pick `width` near the typical interval length so
  * avg_buckets stays ~2 and buckets stay balanced. Degenerate long
  * intervals fan out over many buckets; split such outliers or raise W.
  *
  * Interval bounds are integer columns (days, seconds, …) — callers map
  * dates/timestamps to a number line first; both bounds inclusive.
  */
object RangeJoin {

  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      leftLo: String, leftHi: String,
      rightLo: String, rightHi: String,
      width: Long,
      maxBucketsPerRow: Long = 1L << 16): DataFrame = {
    require(width > 0, "bucket width must be positive")
    require(maxBucketsPerRow > 0, "maxBucketsPerRow must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must not collide")

    // Bucket ids go through double division; |bound| < 2^53 keeps
    // floor(col/width) exact. Beyond that (e.g. nanosecond epochs) buckets
    // would silently coarsen — fail fast instead and let the caller rescale
    // the number line (a nanosecond axis with a >=1s width loses nothing by
    // dividing both by 1e9). A NULL bound is NOT an error: it yields a NULL
    // bucket sequence and the row drops at explode, matching the pre-guard
    // semantics (an interval with an unknown bound can overlap nothing) —
    // the isNull branches below exist because `when(NULL < x)` would
    // otherwise fall through to the raise_error.
    def guarded(c: String) =
      when(col(c).isNull, lit(null).cast("long"))
        .when(abs(col(c)) < (1L << 53), col(c))
        .otherwise(raise_error(lit(s"$c exceeds 2^53: rescale the interval axis")))
    // A degenerate huge interval would otherwise explode into millions of
    // bucket rows on one task — fail fast with the fix in the message.
    def buckets(lo: String, hi: String) = {
      val bLo = floor(guarded(lo) / width)
      val bHi = floor(guarded(hi) / width)
      explode(sequence(
        when(bLo.isNull || bHi.isNull, lit(null).cast("long"))
          .when(bHi - bLo < maxBucketsPerRow, bLo)
          .otherwise(raise_error(lit(
            s"interval [$lo, $hi] spans >$maxBucketsPerRow buckets: raise width " +
              "or split the outlier interval"))),
        bHi)).as("_bucket")
    }

    val l = left.select(col("*"), buckets(leftLo, leftHi))
    val r = right.select(col("*"), buckets(rightLo, rightHi))
    val overlap = col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi)
    val canonical = l("_bucket") === floor(greatest(col(leftLo), col(rightLo)) / width)

    l.join(r, l("_bucket") === r("_bucket") && overlap && canonical)
      .drop("_bucket")
  }
}
