package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Jaccard candidate-pair expansion over one dedup bucket, as a single
  * native expression (the d3 hot path).
  *
  * Input: a sorted `array<bigint>` of packed bucket members
  * `doc_id << 24 | n` (n = the doc's shingle-set size, < 2^24) as built by
  * `DedupCatalog.d3` over [[graft.operators.Dedup.boundedDocLists]].
  * Output: one `struct<pk: bigint, s: int>` per unordered member pair that
  * SURVIVES the jaccard size-ratio prune, where `pk = doc1 << 32 | doc2`
  * (doc1 < doc2 — input order is preserved, and packed order equals doc
  * order because n is a function of doc) and `s = n1 + n2`.
  *
  * Two things make this faster than the equivalent
  * `transform(... filter(... struct(...)))` composition:
  * the higher-order-function lambdas evaluate interpreted per element
  * (each candidate pays closure dispatch + boxed struct building for the
  * ~, 60-90% of pairs the prune then drops), and the composed shape carried
  * `(pk, n1, n2)` per surviving pair — but the jaccard denominator only
  * needs `s = n1 + n2` (`|A∪B| = s − shared`), so the shuffle row shrinks
  * to 12 bytes.
  *
  * Prune: `jaccard >= t` requires `shared >= t/(1+t) · s` and
  * `shared <= min(n1,n2)`, so any pair with
  * `min(n1,n2) < t/(1+t) · s` can never reach the threshold. With t = 0.5:
  * `3·min(n1,n2) >= s`. The threshold is baked at the call site's t = 0.5
  * via the `minFactorNum/Den = 1/3` default (callers with another t pass
  * the matching ratio, or 0/1 to disable pruning).
  */
case class PairCandidates(child: Expression, minFactorNum: Int, minFactorDen: Int)
    extends UnaryExpression with CodegenFallback {

  require(minFactorDen > 0, "minFactorDen must be positive")

  override def prettyName: String = "pair_candidates"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pk", LongType, nullable = false),
      StructField("s", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = arr.numElements()
    // pre-size in LONG arithmetic and clamp: k*(k-1)/2 wraps negative in
    // Int for k > 65536, and pair_candidates is SQL-exposed with no
    // array-length bound — an oversized hint is just a hint
    val out = new java.util.ArrayList[AnyRef](
      math.min(k.toLong * (k - 1) / 2, 1L << 16).toInt)
    var i = 0
    while (i < k - 1) {
      val x = arr.getLong(i)
      val d1 = x >>> 24
      val n1 = (x & 0xffffffL).toInt
      var j = i + 1
      while (j < k) {
        val y = arr.getLong(j)
        val n2 = (y & 0xffffffL).toInt
        val s = n1 + n2
        // keep iff min(n1,n2) * den >= s * num  (t/(1+t) = num/den)
        val mn = math.min(n1, n2)
        if (mn.toLong * minFactorDen >= s.toLong * minFactorNum) {
          val row = new GenericInternalRow(2)
          row.setLong(0, (d1 << 32) | (y >>> 24))
          row.setInt(1, s)
          out.add(row)
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairCandidates {
  /** Default ratio = the d3 call site's jaccard threshold 0.5:
    * t/(1+t) = 1/3. */
  def apply(docs: Column, minFactorNum: Int = 1, minFactorDen: Int = 3): Column =
    ColumnBridge.column(
      new PairCandidates(ColumnBridge.expression(docs), minFactorNum, minFactorDen))
}
