package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 32-bit SimHash signature over a token array.
  *
  * Semantics (bit-compatible with the DuckDB oracle in
  * `graft.catalog.DedupCatalog`): for hex digit j of md5(token), bit j's
  * accumulator moves by +count if the digit's high bit is set, −count
  * otherwise; output bit j is '1' iff the accumulator is positive. Tokens
  * repeat in the input with their natural multiplicity, and Σ(±cnt) over
  * distinct tokens equals Σ(±1) over all occurrences — so no per-document
  * token-frequency map is needed at all.
  *
  * This replaces the d4 shape `explode → groupBy(doc,tok) → 32 aggregates
  * → groupBy(doc)` (two shuffles of the token table) with a map-only
  * projection: one tight loop per document, a reused MessageDigest, no
  * exchange anywhere. CodegenFallback is fine — it evaluates once per
  * document row; the inner loop is compiled Scala. The digit's high bit
  * comes straight from the digest bytes (bit 7 of the high nibble, bit 3
  * of the low), not from hex-string formatting.
  */
case class SimHashSignature(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_signature"

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
    val tokens = input.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    val sums = new Array[Int](32)
    val md = localDigest.get()
    var i = 0
    var nonNull = 0
    while (i < n) {
      val tok = tokens.getUTF8String(i)
      if (tok != null) {
        nonNull += 1
        val bytes = md.digest(tok.getBytes)
        md.reset()
        var b = 0
        while (b < 16) {
          val v = bytes(b)
          if ((v & 0x80) != 0) sums(2 * b) += 1 else sums(2 * b) -= 1
          if ((v & 0x08) != 0) sums(2 * b + 1) += 1 else sums(2 * b + 1) -= 1
          b += 1
        }
      }
      i += 1
    }
    if (nonNull == 0) null
    else {
      val chars = new Array[Char](32)
      var j = 0
      while (j < 32) { chars(j) = if (sums(j) > 0) '1' else '0'; j += 1 }
      UTF8String.fromString(new String(chars))
    }
  }

  // empty token set → null signature (cannot arise from split(), which
  // yields [""] on empty text, but totality beats a surprise)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSignature {
  def apply(tokens: Column): Column =
    ColumnBridge.column(new SimHashSignature(ColumnBridge.expression(tokens)))
}
