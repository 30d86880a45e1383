package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  /** The composable formulation the native expression replaces. */
  private def hofShingles(c: org.apache.spark.sql.Column) = {
    val t = split(lower(c), " ")
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(1), size(t) - 2),
        i => concat_ws(" ", slice(t, i, lit(3))))))
      .otherwise(array().cast("array<string>"))
  }

  test("identical to the HOF formulation on edge-case texts") {
    val texts = Seq(
      "the quick brown fox jumps",
      "a b",                      // < 3 tokens → empty
      "x y z",                    // exactly one shingle
      "dup dup dup dup",          // repeated shingles → distinct
      "Mixed CASE Tokens HERE now",
      "double  space  here yes",  // empty tokens from split preserved
      " leading trailing ",
      "")
    val df = texts.toDF("text")
    val cmp = df.select(
      WordShingles(col("text"), 3).as("native"),
      hofShingles(col("text")).as("hof"))
    val rows = cmp.collect()
    rows.zip(texts).foreach { case (r, t) =>
      val native = r.getSeq[String](0).sorted
      val hof = r.getSeq[String](1).sorted
      assert(native == hof, s"text='$t' native=$native hof=$hof")
    }
  }

  test("shingle expressions stay inside a WholeStageCodegen span (round-17: real doGenCode, no fallback split)") {
    // Before round 17 both expressions were CodegenFallback, which forces
    // the enclosing Project OUT of whole-stage codegen — every operator
    // fused around the shingle stage fell back to interpreted evaluation.
    // spark.range, not a local Seq: ConvertToLocalRelation would constant-
    // fold a literal input into a LocalTableScan with no codegen stage
    val df = spark.range(0, 8).select(
        concat_ws(" ", lit("a"), col("id"), lit("c d e")).as("text"))
      .select(
        WordShingles(col("text"), 3).as("s"),
        HashedWordShingles(col("text"), 3).as("h"))
    df.collect()
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.exists(w =>
      w.toString.contains("word_shingles") && w.toString.contains("hashed_word_shingles")),
      s"expected the shingle projection inside WholeStageCodegen:\n" +
        df.queryExecution.executedPlan)
  }

  test("null text yields null; non-string input rejected") {
    val df = Seq(Option.empty[String], Some("a b c d")).toDF("text")
    val out = df.select(WordShingles(col("text")).as("s")).collect()
    assert(out.exists(_.isNullAt(0)))
    assert(out.exists(r => !r.isNullAt(0) && r.getSeq[String](0).size == 2))
    intercept[Exception] {
      Seq(1, 2).toDF("text").select(WordShingles(col("text"))).collect()
    }
  }
}
