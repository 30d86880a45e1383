package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass MinHash signature over a shingle array.
  *
  * Semantics (bit-compatible with the DuckDB oracle in
  * `graft.catalog.DedupCatalog`): per shingle, `h` = the first 15 hex chars
  * of md5(shingle) as a 60-bit integer, reduced mod P; the signature's entry
  * `s` is `min over shingles of (h·a_s + b_s) mod P`.
  *
  * The composable formulation (`transform(shingles, md5 …)` + 9
  * `array_min(transform(...))`) walks interpreted lambda trees and allocates
  * intermediate arrays per document. This expression does one tight loop per
  * document with a REUSED MessageDigest — CodegenFallback is fine because it
  * evaluates once per document row (thousands), not once per shingle
  * (millions); the inner loop is compiled Scala.
  */
case class MinHashSignature(
    child: Expression,
    coeffs: Seq[(Long, Long)],
    modulus: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  @transient private lazy val localDigest =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val k = coeffs.length
    val mins = Array.fill(k)(Long.MaxValue)
    val md = localDigest.get()
    var i = 0
    var nonNull = 0
    while (i < n) {
      val sh = shingles.getUTF8String(i)
      if (sh != null) { // null elements are skipped, as list_min skips NULLs
        nonNull += 1
        val bytes = md.digest(sh.getBytes)
        md.reset()
        // first 15 hex chars == first 7.5 bytes, big-endian → 60-bit value
        var v = 0L
        var j = 0
        while (j < 7) { v = (v << 8) | (bytes(j) & 0xffL); j += 1 }
        v = (v << 4) | ((bytes(7) >> 4) & 0xfL)
        val h = v % modulus
        var s = 0
        while (s < k) {
          val (a, b) = coeffs(s)
          val m = (h * a + b) % modulus
          if (m < mins(s)) mins(s) = m
          s += 1
        }
      }
      i += 1
    }
    if (nonNull == 0) null else new GenericArrayData(mins)
  }

  // empty shingle set → null signature (matches list_min over empty = NULL
  // propagating through the oracle's list construction)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(shingles: Column, coeffs: Seq[(Long, Long)], modulus: Long): Column =
    ColumnBridge.column(new MinHashSignature(
      ColumnBridge.expression(shingles), coeffs, modulus))
}
