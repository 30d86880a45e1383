package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check: bucketized overlap join equals the naive quadratic
  * overlap filter — every overlapping pair appears EXACTLY once (the
  * canonical-bucket rule must neither drop nor duplicate), across bucket
  * widths smaller than, near, and larger than the interval lengths.
  */
object RangeJoinCheck extends Properties("graft.operators.RangeJoin") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session

  private val genIv = for {
    lo <- Gen.choose(-50L, 50L)   // negative lows exercise floor-division buckets
    len <- Gen.choose(0L, 12L)
  } yield (lo, lo + len)

  property("equals the quadratic overlap filter, exactly once per pair") =
    forAll(Gen.listOfN(25, genIv), Gen.listOfN(25, genIv),
        Gen.oneOf(1L, 5L, 16L, 100L)) { (as, bs, width) =>
      import spark.implicits._
      val left = as.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("a_id", "a_lo", "a_hi")
      val right = bs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("b_id", "b_lo", "b_hi")
      val got = RangeJoin.overlapJoin(left, right, "a_lo", "a_hi", "b_lo", "b_hi", width)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toList
      val expected = for {
        ((alo, ahi), i) <- as.zipWithIndex
        ((blo, bhi), j) <- bs.zipWithIndex
        if alo <= bhi && blo <= ahi
      } yield (i.toLong, j.toLong)
      got.sorted == expected.sorted // list equality: duplicates would fail
    }
}
