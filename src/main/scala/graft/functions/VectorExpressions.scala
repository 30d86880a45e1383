package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the float-vector dot product — the hot
  * inner loop of every similarity/ANN operator.
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * is evaluated as interpreted higher-order lambdas: per element it boxes,
  * allocates, and walks an expression tree. This expression emits a tight
  * primitive loop through whole-stage codegen instead (~10× on 64-dim
  * vectors) while keeping the exact same semantics: left-to-right IEEE
  * double accumulation of `(double)a(i) * (double)b(i)` — bit-identical to
  * both the HOF fold and DuckDB's `list_sum(list_transform(...))`, which is
  * what keeps cosine scores hash-comparable against the oracle.
  *
  * Mismatch/null semantics also mirror the HOF fold exactly: `zip_with`
  * pads the shorter array with nulls and a null element poisons the
  * aggregate sum, so a length mismatch or any null element yields NULL —
  * this expression does the same (it does NOT silently truncate to the
  * shorter length or read nulls as 0).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // a well-typed non-null input pair can still produce NULL (length
  // mismatch / null element)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def prettyName: String = "float_vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native exact integer squared L2 distance over two `array<long>` — the
  * hot pair loop of the quantized similarity operators (s9's cell-blocked
  * k-NN join). Same motivation as [[FloatVectorDot]]: the composable
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, _+_)` runs as
  * interpreted lambdas and allocates a 64-element array PER PAIR — at
  * millions of in-cell pairs that is the whole query cost (observed 50 s →
  * 6 s at sf1.0). Exact long arithmetic, identical to the HOF fold and to
  * DuckDB's per-position `SUM((a.v-b.v)*(a.v-b.v))`, so hash parity is
  * untouched. Overflow envelope: same as the operators' micro-unit
  * contract — d·(2·max|q|)² must fit a long.
  *
  * Mismatch/null semantics mirror the HOF fold exactly (same contract as
  * [[FloatVectorDot]]): a length mismatch or any null element yields
  * NULL, never a silent truncation or a null-read-as-0.
  */
case class LongVectorSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  // a well-typed non-null input pair can still produce NULL (length
  // mismatch / null element)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def prettyName: String = "long_vector_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for [[FloatVectorDot]]. */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[LongVectorSqDist]]. */
  def sqDistL(a: Column, b: Column): Column =
    ColumnBridge.column(LongVectorSqDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
