package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the payload of the
  * latest right row with the same key and `right.ts <= left.ts` (the
  * time-series point-in-time lookup Spark has no built-in operator for;
  * cf. pandas `merge_asof`, DuckDB `ASOF JOIN`).
  *
  * Implementation is the scale-path formulation, NOT a range join: tag both
  * sides, union them, and run ONE window per key ordered by (ts, tag) where
  * right rows sort before left rows at equal timestamps (<= semantics); a
  * `last(_, ignoreNulls)` over the unbounded-preceding frame carries each
  * right payload forward to the left rows it governs. Cost is a single
  * shuffle of |L|+|R| rows on the key plus a per-partition sort —
  * O((|L|+|R|) log) with NO candidate-pair blowup, where the naive
  * `l JOIN r ON key AND r.ts <= l.ts` + max-filter explodes to every
  * historical pair (quadratic per key: fatal at 100 TB).
  *
  * Rows tied within the right side on (key, ts) are broken by `rightOrder`
  * (pass a unique column for determinism).
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      rightOrder: Seq[Column] = Nil): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload columns ${payload.mkString(",")} collide with left side")

    // Common tagged shape: keys + _ts/_tag + right payload (as ONE struct, so
    // every carried field comes from the same right row even when a payload
    // field is null) + right tiebreak + the left's non-key columns (null on
    // the right side).
    val leftCarry = leftCols.filterNot(keys.contains)
    val payloadStructType = org.apache.spark.sql.types.StructType(
      payload.map(p => org.apache.spark.sql.types.StructField(p, right.schema(p).dataType)))
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_tag"),
          struct(payload.map(col): _*).as("_pay")) ++
        rightOrder.zipWithIndex.map { case (c, i) => c.as(s"_ro$i") } ++
        leftCarry.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("_ts"), lit(1).as("_tag"),
          lit(null).cast(payloadStructType).as("_pay")) ++
        rightOrder.indices.map(i => lit(null).as(s"_ro$i")) ++
        leftCarry.map(col): _*)
    val unioned = taggedRight.unionByName(taggedLeft)

    // tag=0 before tag=1 at equal ts → a right row AT the left timestamp is
    // eligible (<=); rightOrder breaks right-side ties deterministically.
    val order = Seq(col("_ts").asc, col("_tag").asc) ++
      rightOrder.indices.map(i => col(s"_ro$i").asc_nulls_last)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("_pay", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"_pay.$p").as(p)): _*)
  }
}
