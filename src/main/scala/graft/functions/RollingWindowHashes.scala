package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** TRUE rolling polynomial window hashes over a token-hash array — d14's
  * hot loop as one native pass (the SimHashSignature posture: evaluated
  * once per document row, the inner loop is compiled Scala).
  *
  * Input: `array<long>` of per-token hashes (non-negative; d14 feeds 60-bit
  * md5 prefixes — the cross-engine string→int bridge). Output: one struct
  * `(pos, h1, h2, h3)` per stride-1 window of length `windowLen`, where
  * h_k = Σ_j (t[pos+j] mod p_k) · B_k^(W-1-j) mod p_k under three distinct
  * 31-bit primes — EXACTLY the left fold `(acc·B + t mod p) mod p` the
  * DuckDB oracle computes per window, but maintained incrementally:
  * h ← ((h − t_out·B^(W-1)) · B + t_in) mod p, three updates (~12 integer
  * ops) per window instead of a W-element fold. Why native: Spark's
  * `aggregate` HOF runs interpreted (no codegen for lambda functions), so
  * the fold form pays ~3·W boxed lambda calls per window — measured SLOWER
  * than the md5-of-concat it replaced; this pass is O(tokens) per document
  * total, independent of W, and allocates nothing per window but the
  * output struct. All intermediates stay under 2^52 (p < 2^31, B < 2^20),
  * overflow-free long arithmetic.
  *
  * Documents shorter than `windowLen` yield NULL (explode emits nothing) —
  * the d13 one-evaluation posture, no separate length guard needed.
  */
case class RollingWindowHashes(child: Expression, windowLen: Int)
    extends UnaryExpression with CodegenFallback {

  import RollingWindowHashes.{Bases, Primes}

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false),
    StructField("h3", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "rolling_window_hashes"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  // B^(W-1) mod p per lane — the eviction multiplier of the rolling update
  @transient private lazy val outMul: Array[Long] = Array.tabulate(3) { k =>
    var m = 1L; var i = 1
    while (i < windowLen) { m = m * Bases(k) % Primes(k); i += 1 }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[ArrayData]
    val n = t.numElements()
    if (n < windowLen) return null
    val out = new Array[Any](n - windowLen + 1)
    val h = new Array[Long](3)
    var k = 0
    while (k < 3) { // first window: the plain left fold
      var acc = 0L; var j = 0
      while (j < windowLen) {
        acc = (acc * Bases(k) + t.getLong(j) % Primes(k)) % Primes(k)
        j += 1
      }
      h(k) = acc; k += 1
    }
    out(0) = InternalRow(1L, h(0), h(1), h(2))
    var i = windowLen
    while (i < n) {
      k = 0
      while (k < 3) {
        val p = Primes(k)
        val evict = t.getLong(i - windowLen) % p * outMul(k) % p
        h(k) = ((h(k) - evict + p) % p * Bases(k) + t.getLong(i) % p) % p
        k += 1
      }
      out(i - windowLen + 1) = InternalRow((i - windowLen + 2).toLong, h(0), h(1), h(2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingWindowHashes {
  /** The three largest primes below 2^31 — shared verbatim with the d14
    * oracle SQL; three ~31-bit lanes give a ~93-bit combined key. */
  val Primes: Array[Long] = Array(2147483647L, 2147483629L, 2147483587L)
  val Bases: Array[Long] = Array(1000003L, 1000033L, 1000037L)

  def apply(tokenHashes: Column, windowLen: Int): Column =
    ColumnBridge.column(
      new RollingWindowHashes(ColumnBridge.expression(tokenHashes), windowLen))
}
