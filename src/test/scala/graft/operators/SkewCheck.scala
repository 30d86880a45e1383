package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check: both salted-join forms agree with the obviously-correct
  * quadratic reference (every fact row × every dim row, keep key matches,
  * SQL null semantics: a NULL key matches nothing) on random data across
  * random bucket counts and hot-key thresholds — including thresholds that
  * make everything hot, nothing hot, and a mixed split.
  */
// Top-level on purpose: encoder codegen cannot instantiate case classes
// nested inside an object (see AsOfJoinCheck).
case class SkewCheckF(key: String, rowId: Long, v: Double)
case class SkewCheckD(key: String, label: String)

object SkewCheck extends Properties("graft.operators.Skew") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session

  // "hot" dominates the fact (skew), cold keys have a few rows each, and
  // an occasional NULL key pins the null-matches-nothing contract.
  private val genF = for {
    key <- Gen.frequency((8, Gen.const("hot")), (3, Gen.oneOf("a", "b", "c", "d")),
      (1, Gen.const(null: String)))
    rowId <- Gen.choose(1L, 1000000L)
    v <- Gen.choose(0, 99).map(_.toDouble)
  } yield SkewCheckF(key, rowId, v)

  private val genD = for {
    key <- Gen.frequency((4, Gen.oneOf("hot", "a", "b", "c", "d", "e")),
      (1, Gen.const(null: String)))
    label <- Gen.oneOf("L1", "L2", "L3")
  } yield SkewCheckD(key, label)

  private def reference(fs: List[SkewCheckF], ds: List[SkewCheckD]): Seq[(String, Long, Double, String)] =
    (for {
      f <- fs if f.key != null
      d <- ds if f.key == d.key
    } yield (f.key, f.rowId, f.v, d.label)).sorted

  private def run(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Double, String)] =
    df.select("key", "rowId", "v", "label")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSeq.sorted

  property("saltedJoin == quadratic reference join") =
    forAll(Gen.listOfN(120, genF), Gen.listOfN(12, genD), Gen.choose(1, 8)) {
      (fs, ds, buckets) =>
        import spark.implicits._
        val got = run(Skew.saltedJoin(
          fs.toDF(), ds.toDF(), Seq("key"), saltBy = col("rowId"), buckets = buckets))
        got == reference(fs, ds)
    }

  property("saltedJoinHot == quadratic reference across threshold regimes") =
    forAll(Gen.listOfN(120, genF), Gen.listOfN(12, genD), Gen.choose(1, 8),
      Gen.oneOf(1L, 5L, 40L, 1000L)) { (fs, ds, buckets, threshold) =>
      import spark.implicits._
      val got = run(Skew.saltedJoinHot(
        fs.toDF(), ds.toDF(), Seq("key"), saltBy = col("rowId"),
        buckets = buckets, hotRowThreshold = threshold))
      got == reference(fs, ds)
    }
}
