package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Branch-based twins of the builtin `try_cast` / `try_add` / `try_divide`
  * error-safe arithmetic (SURVEY §2.9 / the f8 parity surface).
  *
  * Spark implements the TRY eval mode by THROWING the ANSI error and
  * catching it per failing row — `Math.addExact`'s ArithmeticException,
  * the string-cast's NumberFormatException, the divide's
  * DIVIDE_BY_ZERO — so a column whose failure rate is high pays JVM
  * exception machinery per row (measured on the f8 fixture: ~11 µs/row
  * for a 100%-failing string cast, ~21 µs/row for an overflowing
  * try_add; the entry read 2.5 s SOLO for a 100k-row map-only scan). At
  * warehouse scale a feed where "most rows don't parse" is the NORMAL
  * shape — error-safe ingestion is exactly for dirty data — so the fast
  * path must be a BRANCH, not a catch. These expressions compute the
  * identical results with no exception on any path:
  *
  *  - [[TryStringToLong]]: `UTF8String.toLong(LongWrapper)` — the
  *    non-throwing parser the throwing cast wraps — null on junk;
  *  - [[TryAddLong]]: two's-complement overflow detected by sign
  *    algebra (`((a^r) & (b^r)) < 0` — overflow iff both operands share
  *    a sign and the result flips it), null on overflow;
  *  - [[TryDivideDouble]]: divisor == 0 → null (the documented
  *    try_divide contract: "result is always null if divisor is 0",
  *    for doubles too — never IEEE Infinity), else IEEE division.
  *
  * Semantics are hash-pinned against DuckDB's TRY_CAST / NULLIF oracle
  * forms by the f8 catalog entry; TrySafeSpec additionally pins each
  * expression equal to its builtin try_* twin row-by-row on the
  * domain the entries exercise (junk/whitespace/parseable strings,
  * both overflow signs, zero/nonzero/null divisors).
  */
object TrySafe {
  def tryStringToLong(c: Column): Column =
    ColumnBridge.column(TryStringToLong(ColumnBridge.expression(c)))
  def tryAddLong(a: Column, b: Column): Column =
    ColumnBridge.column(TryAddLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def tryDivideDouble(num: Column, den: Column): Column =
    ColumnBridge.column(TryDivideDouble(
      ColumnBridge.expression(num), ColumnBridge.expression(den)))
}

/** `try_cast(string AS BIGINT)` without the throw/catch: null when the
  * string does not parse as a (whitespace-trimmed, optionally signed)
  * integral long. `UTF8String.toLong(LongWrapper)` is the non-throwing
  * parser, but it is the LEGACY-lax one — it truncates a decimal point
  * ("4.5" → 4) where ANSI try_cast rejects it — so inputs containing
  * '.' are rejected up front (TrySafeSpec pins "4.5" → null = builtin). */
case class TryStringToLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "try_string_to_long"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    if (u.contains(TryStringToLong.Dot)) return null
    val w = new UTF8String.LongWrapper
    if (u.toLong(w)) w.value else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wrapperCls = classOf[UTF8String.LongWrapper].getName
    val wrapper = ctx.addMutableState(wrapperCls, "tryLongWrapper",
      v => s"$v = new $wrapperCls();")
    val dot = ctx.addReferenceObj("tryLongDot", TryStringToLong.Dot,
      classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |if (!$s.contains($dot) && $s.toLong($wrapper)) {
         |  ${ev.value} = $wrapper.value;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TryStringToLong {
  private[functions] val Dot: UTF8String = UTF8String.fromString(".")
}

/** `try_add(BIGINT, BIGINT)` without Math.addExact's throw: overflow
  * detected by sign algebra, null instead of the caught exception. */
case class TryAddLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "try_add_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    val r = x + y
    if (((x ^ r) & (y ^ r)) < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |long $r = $a + $b;
         |if ((($a ^ $r) & ($b ^ $r)) < 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `try_divide(DOUBLE, DOUBLE)` as a branch: divisor 0.0 (either sign)
  * → null — try_divide's documented contract even for doubles, where
  * plain division would give IEEE ±Infinity/NaN — else IEEE division. */
case class TryDivideDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "try_divide_double"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val den = b.asInstanceOf[Double]
    if (den == 0.0) null else a.asInstanceOf[Double] / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($b == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $a / $b;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
