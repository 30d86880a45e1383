package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The branch-based try twins must equal the builtin try_* row-by-row —
  * including the failure rows whose exception cost they exist to avoid —
  * and both eval paths (interpreted nullSafeEval, whole-stage codegen)
  * must agree, which the plain DataFrame run exercises via codegen and
  * the filter-pushdown-disabled collect via eval. */
class TrySafeSpec extends SparkSpec {
  import spark.implicits._

  test("tryStringToLong == try_cast(string AS BIGINT) on the parse domain") {
    val rows = Seq("click", "42", "-7", " 13 ", "", "9223372036854775807",
      "9223372036854775808", // beyond Long.MAX -> null
      "4.5", "0x1f", "+8", null).toDF("s")
    val got = rows.select(
      TrySafe.tryStringToLong(col("s")).as("fast"),
      expr("try_cast(s AS BIGINT)").as("builtin"))
    val bad = got.filter(!(col("fast") <=> col("builtin"))).collect()
    assert(bad.isEmpty, s"twin mismatch: ${bad.mkString(", ")}")
  }

  test("tryAddLong == try_add on both overflow signs and clean adds") {
    val rows = Seq(
      (Long.MaxValue, 1L), (Long.MaxValue, 0L), (Long.MaxValue - 1L, 2L),
      (Long.MinValue, -1L), (Long.MinValue, 1L), (Long.MinValue + 1L, -2L),
      (5L, 7L), (-5L, -7L), (0L, 0L)).toDF("a", "b")
    val got = rows.select(
      TrySafe.tryAddLong(col("a"), col("b")).as("fast"),
      expr("try_add(a, b)").as("builtin"))
    val bad = got.filter(!(col("fast") <=> col("builtin"))).collect()
    assert(bad.isEmpty, s"twin mismatch: ${bad.mkString(", ")}")
    // null propagation
    val n = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(TrySafe.tryAddLong(col("a"), col("b"))).head
    assert(n.isNullAt(0))
  }

  test("tryDivideDouble == try_divide: zero divisor (either sign) is null, never Inf") {
    val rows = Seq(
      (1.0, 0.0), (1.0, -0.0), (0.0, 0.0), (-3.5, 0.0),
      (1.0, 2.0), (-7.0, 0.5), (0.0, 3.0)).toDF("a", "b")
    val got = rows.select(
      TrySafe.tryDivideDouble(col("a"), col("b")).as("fast"),
      expr("try_divide(a, b)").as("builtin"))
    val bad = got.filter(!(col("fast") <=> col("builtin"))).collect()
    assert(bad.isEmpty, s"twin mismatch: ${bad.mkString(", ")}")
    val inf = rows.select(TrySafe.tryDivideDouble(col("a"), col("b")).as("r"))
      .filter(col("r").isNotNull && (isnan(col("r")) || col("r") === Double.PositiveInfinity
        || col("r") === Double.NegativeInfinity)).count()
    assert(inf == 0, "zero divisor must yield null, not IEEE Inf/NaN")
  }

  test("interpreted eval agrees with the codegen results") {
    // the DataFrame runs above exercise whole-stage codegen; this calls
    // the interpreted nullSafeEval directly on literals
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val row = InternalRow.empty
    assert(TryStringToLong(Literal(UTF8String.fromString("click"),
      org.apache.spark.sql.types.StringType)).eval(row) == null)
    assert(TryStringToLong(Literal(UTF8String.fromString(" -13 "),
      org.apache.spark.sql.types.StringType)).eval(row) == -13L)
    assert(TryAddLong(Literal(Long.MaxValue), Literal(1L)).eval(row) == null)
    assert(TryAddLong(Literal(Long.MaxValue - 1L), Literal(1L)).eval(row) == Long.MaxValue)
    assert(TryAddLong(Literal(Long.MinValue), Literal(-1L)).eval(row) == null)
    assert(TryDivideDouble(Literal(1.0), Literal(0.0)).eval(row) == null)
    assert(TryDivideDouble(Literal(1.0), Literal(4.0)).eval(row) == 0.25)
  }
}
