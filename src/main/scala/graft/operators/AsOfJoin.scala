package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for every left row, attach the payload of the governing
  * right row with the same key — the latest at-or-before (`backward`), the
  * earliest at-or-after (`forward`), or the closer of the two (`nearest`) —
  * the time-series point-in-time lookup Spark has no built-in operator for
  * (cf. pandas `merge_asof(direction=...)`, DuckDB `ASOF JOIN`).
  *
  * Implementation is the scale-path formulation, NOT a range join: tag both
  * sides, union them, and run ONE window per key ordered by (ts, tag) where
  * right rows sort before left rows at equal timestamps (inclusive
  * semantics); a `last(_, ignoreNulls)` over the unbounded-preceding frame
  * carries each right payload forward to the left rows it governs. Cost is
  * a single shuffle of |L|+|R| rows on the key plus a per-partition sort —
  * O((|L|+|R|) log) with NO candidate-pair blowup, where the naive
  * `l JOIN r ON key AND r.ts <= l.ts` + max-filter explodes to every
  * historical pair (quadratic per key: fatal at 100 TB). `forward` is the
  * same window over the reversed timestamp order; `nearest` evaluates both
  * directions over the SAME single shuffle (two intra-partition sorts) and
  * picks per-row by temporal distance, ties to the backward match.
  *
  * Rows tied within the right side on (key, ts) are broken by `rightOrder`
  * (pass a unique column for determinism).
  */
object AsOfJoin {

  /** Internal column names used by the tagged-union shape; inputs must not
    * collide with them (checked — a caller column literally named `_ts`
    * would otherwise silently corrupt the window result). `_payb`/`_payf`
    * are only created by `nearest`, but they are reserved for every
    * direction: rejecting a rare column name beats direction-dependent
    * corruption semantics. */
  private def reserved(rightOrderN: Int): Seq[String] =
    Seq("_ts", "_tag", "_pay", "_payb", "_payf") ++
      (0 until rightOrderN).map(i => s"_ro$i")

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      rightOrder: Seq[Column] = Nil): DataFrame =
    joinDirected(left, right, keys, leftTs, rightTs, payload, rightOrder, ascending = true)

  /** Earliest right row with `right.ts >= left.ts` (pandas
    * `direction='forward'`): the backward window over negated time. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      rightOrder: Seq[Column] = Nil): DataFrame =
    joinDirected(left, right, keys, leftTs, rightTs, payload, rightOrder, ascending = false)

  private def joinDirected(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      rightOrder: Seq[Column],
      ascending: Boolean): DataFrame = {
    val (unioned, leftCols) =
      tagged(left, right, keys, leftTs, rightTs, payload, rightOrder)
    val w = directedWindow(keys, rightOrder.size, ascending)
    unioned
      .withColumn("_pay", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"_pay.$p").as(p)): _*)
  }

  /** Closer of the backward and forward matches by |left.ts − right.ts|,
    * ties to the backward match. One shuffle (both windows share the key
    * partitioning), two intra-partition sorts. Timestamp distance is
    * measured on the values cast to double (seconds for timestamps, the
    * raw magnitude for numerics). */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      rightOrder: Seq[Column] = Nil): DataFrame = {
    // The distance converter below is derived from ONE type and applied to
    // both the left `_ts` and the carried right `_rts`; with differing
    // types (TIMESTAMP vs TIMESTAMP_NTZ, timestamp vs numeric) one side
    // would be converted wrongly (unix_micros on an NTZ value is
    // tz-shifted) and the nearer match silently mispicked. The union also
    // coerces `_ts` to a common type behind the window ordering. Mixed
    // axes have no well-defined distance — reject them up front; callers
    // cast one side explicitly.
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"nearest() needs matching timestamp types: left $leftTs is " +
        s"${left.schema(leftTs).dataType.catalogString}, right $rightTs is " +
        s"${right.schema(rightTs).dataType.catalogString} — cast one side first")
    val (unioned, leftCols) =
      tagged(left, right, keys, leftTs, rightTs, payload, rightOrder, carryRightTs = true)
    val wb = directedWindow(keys, rightOrder.size, ascending = true)
    val wf = directedWindow(keys, rightOrder.size, ascending = false)
    val both = unioned
      .withColumn("_payb", last(col("_pay"), ignoreNulls = true).over(wb))
      .withColumn("_payf", last(col("_pay"), ignoreNulls = true).over(wf))
      .filter(col("_tag") === 1)
    // Distance as double seconds (micros/1e6 in one double division —
    // bit-identical to CAST(epoch_us(x) AS DOUBLE)/1e6 on other engines).
    // TIMESTAMP_NTZ has no double cast and unix_micros is tz-shifted, so
    // NTZ goes through an epoch-anchored timestampdiff (tz-independent).
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val toD: String => Column = left.schema(leftTs).dataType match {
      case TimestampNTZType => p =>
        expr(s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', $p)")
          .cast("double") / 1e6
      case TimestampType => p => unix_micros(expr(p)).cast("double") / 1e6
      case _ => p => expr(p).cast("double")
    }
    val db = toD("_ts") - toD("_payb._rts")
    val df = toD("_payf._rts") - toD("_ts")
    val chosen = when(col("_payb").isNull, col("_payf"))
      .when(col("_payf").isNull, col("_payb"))
      .when(db <= df, col("_payb"))
      .otherwise(col("_payf"))
    both.withColumn("_pay", chosen)
      .select(leftCols.map(col) ++ payload.map(p => col(s"_pay.$p").as(p)): _*)
  }

  /** Common tagged-union shape: keys + _ts/_tag + right payload (as ONE
    * struct, so every carried field comes from the same right row even when
    * a payload field is null; `carryRightTs` adds the right timestamp as
    * `_rts` for distance comparison) + right tiebreak + the left's non-key
    * columns (null on the right side). */
  private def tagged(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      rightOrder: Seq[Column],
      carryRightTs: Boolean = false): (DataFrame, Seq[String]) = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload columns ${payload.mkString(",")} collide with left side")
    val bad = reserved(rightOrder.size)
      .filter(r => leftCols.contains(r) || right.columns.contains(r))
    require(bad.isEmpty,
      s"input columns ${bad.mkString(",")} collide with as-of internal names")
    require(!carryRightTs || !payload.contains("_rts"),
      "payload name _rts is reserved by nearest()")

    val leftCarry = leftCols.filterNot(keys.contains)
    val payFields = (if (carryRightTs) payload :+ "_rts" else payload)
    val payloadStructType = org.apache.spark.sql.types.StructType(
      payFields.map(p => org.apache.spark.sql.types.StructField(
        p, right.schema(if (p == "_rts") rightTs else p).dataType)))
    val rightPay = struct(
      payload.map(col) ++
        (if (carryRightTs) Seq(col(rightTs).as("_rts")) else Nil): _*)
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_tag"), rightPay.as("_pay")) ++
        rightOrder.zipWithIndex.map { case (c, i) => c.as(s"_ro$i") } ++
        leftCarry.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("_ts"), lit(1).as("_tag"),
          lit(null).cast(payloadStructType).as("_pay")) ++
        rightOrder.indices.map(i => lit(null).as(s"_ro$i")) ++
        leftCarry.map(col): _*)
    (taggedRight.unionByName(taggedLeft), leftCols)
  }

  /** tag=0 before tag=1 at equal ts in EITHER direction → a right row AT
    * the left timestamp is eligible (inclusive <=/>=); rightOrder breaks
    * right-side ties deterministically. Descending order = the forward
    * join's "latest right at-or-before" becomes "earliest at-or-after". */
  private def directedWindow(keys: Seq[String], rightOrderN: Int, ascending: Boolean) = {
    val tsOrder = if (ascending) col("_ts").asc else col("_ts").desc
    val order = Seq(tsOrder, col("_tag").asc) ++
      (0 until rightOrderN).map(i => col(s"_ro$i").asc_nulls_last)
    Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }
}
