package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the HOF fold on random vectors") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      (i, Array.fill(64)(rng.nextFloat() * 2 - 1), Array.fill(64)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      VectorExpressions.dotF(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
    // exact bit equality, not tolerance — both are the same IEEE fold
    assert(cmp.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("sqDistL equals the integer HOF fold exactly, incl. negatives and nulls") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i, Array.fill(64)(rng.nextInt(2000001).toLong - 1000000L),
        Array.fill(64)(rng.nextInt(2000001).toLong - 1000000L))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, z) => acc + z)
    val cmp = df.select(
      VectorExpressions.sqDistL(col("a"), col("b")).as("native"), hof.as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() == 0)
    val withNull = Seq(
      (Some(Array(1L, 2L)), Some(Array(4L, 0L))),
      (None, Some(Array(1L)))).toDF("a", "b")
      .select(VectorExpressions.sqDistL(col("a"), col("b")).as("d"))
      .collect()
    assert(withNull(0).getLong(0) == 13L) // 3² + 2²
    assert(withNull(1).isNullAt(0))
    intercept[Exception] {
      Seq((Array(1.0), Array(2.0))).toDF("a", "b")
        .select(VectorExpressions.sqDistL(col("a"), col("b"))).collect()
    }
  }

  test("null propagation and type checking") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (None, Some(Array(1f)))).toDF("a", "b")
    val out = df.select(VectorExpressions.dotF(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(11.0), None))
    intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(VectorExpressions.dotF(col("a"), col("b"))).collect()
    }
  }

  test("length mismatch and null elements yield NULL, exactly like the HOF fold") {
    // zip_with pads the short side with nulls and a null poisons the
    // aggregate sum → the HOF yields NULL; the native expressions must
    // match (no silent truncation, no null-read-as-0)
    val fRows = Seq(
      (Array(1f, 2f, 3f), Array(1f, 1f)),              // length mismatch
      (Array(1f, 2f), Array(1f, 1f))).toDF("a", "b")   // control
    val f = fRows.select(
      VectorExpressions.dotF(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    assert(f(0).isNullAt(0) && f(0).isNullAt(1))
    assert(f(1).getDouble(0) == 3.0 && f(1).getDouble(1) == 3.0)

    val lRows = Seq(
      (Array[java.lang.Long](1L, null), Array[java.lang.Long](1L, 1L)), // null element
      (Array[java.lang.Long](1L, 2L), Array[java.lang.Long](1L, 1L)))
      .toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, z) => acc + z)
    val l = lRows.select(
      VectorExpressions.sqDistL(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    assert(l(0).isNullAt(0) && l(0).isNullAt(1))
    assert(l(1).getLong(0) == 1L && l(1).getLong(1) == 1L)
  }

  test("survives whole-stage codegen in a realistic pair-join plan") {
    val rng = new scala.util.Random(7)
    val e = (0 until 50).map(i => (i.toLong, Array.fill(16)(rng.nextFloat()))).toDF("id", "v")
    val joined = e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .select(VectorExpressions.dotF(col("x.v"), col("y.v")).as("d"))
    assert(joined.count() == 50 * 49 / 2)
    assert(joined.filter(col("d").isNull).count() == 0)
  }
}
