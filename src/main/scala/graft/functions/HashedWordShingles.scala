package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hashes of the distinct word n-gram shingles of lowercased text,
  * in one pass over the raw bytes — the shingle path for consumers that
  * only ever GROUP on the shingle (d3 Jaccard candidate generation), where
  * the string itself is dead weight.
  *
  * [[WordShingles]] + `transform(_, s => xxhash64(s))` materializes every
  * shingle: token String array, per-window StringBuilder, a
  * LinkedHashSet of shingle Strings, UTF8String conversions, and a
  * non-codegen lambda eval per element. Here nothing is allocated per
  * token: the lowercased UTF8String is scanned byte-wise (a 0x20 separator
  * can never appear inside a multi-byte UTF-8 sequence), each token hashed
  * in place via XXH64 over its byte range, and each shingle hash is an
  * order-sensitive polynomial combine of its n token hashes. Distinct
  * shingle strings map to distinct hashes up to 64-bit collisions — the
  * same birthday bound the downstream grouping already carries (documented
  * at the d3 call site).
  *
  * Token semantics match `split(lower(text), " ")` exactly: every single
  * space is a separator and empty tokens count, so the shingle COUNT (the
  * Jaccard denominator) equals the string formulation's. Below n tokens:
  * empty array. Output order is ascending (sort-based dedup).
  */
case class HashedWordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  /** One-pass hashed-shingle construction; shared verbatim by the
    * interpreted path ([[nullSafeEval]]) and the generated code (round-17,
    * VERDICT r16 #8: real codegen so the enclosing Project stays in the
    * WholeStageCodegen span instead of forcing the stage interpreted). */
  def compute(input: UTF8String): GenericArrayData = {
    val s = input.toLowerCase
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()

    // token count = separators + 1 (split(_, " ", -1) semantics)
    var nToks = 1
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte) nToks += 1
      i += 1
    }
    if (nToks < n) return new GenericArrayData(Array.emptyLongArray)

    // hash every token in place over its byte range
    val tokH = new Array[Long](nToks)
    var t = 0
    var start = 0
    i = 0
    while (i <= len) {
      val atSep =
        i == len || org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte
      if (atSep) {
        tokH(t) = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
        t += 1
        start = i + 1
      }
      i += 1
    }

    // shingle hash = order-sensitive polynomial combine of n token hashes
    val nShingles = nToks - n + 1
    val hs = new Array[Long](nShingles)
    i = 0
    while (i < nShingles) {
      var h = tokH(i)
      var j = 1
      while (j < n) { h = h * Prime + tokH(i + j); j += 1 }
      hs(i) = h
      i += 1
    }

    // sort-based dedup (distinct shingles per doc, ascending)
    java.util.Arrays.sort(hs)
    var uniq = 1
    i = 1
    while (i < nShingles) {
      if (hs(i) != hs(i - 1)) { hs(uniq) = hs(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(
      if (uniq == nShingles) hs else java.util.Arrays.copyOf(hs, uniq))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedWordShingles", this,
      classOf[HashedWordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  private val Seed = 42L
  // 0x9E3779B97F4A7C15: the 64-bit golden-ratio mixing constant (any odd
  // multiplier works for the order-sensitive polynomial combine)
  private val Prime = -7046029254386353131L
}

object HashedWordShingles {
  def apply(text: Column, n: Int = 3): Column =
    ColumnBridge.column(new HashedWordShingles(ColumnBridge.expression(text), n))
}
