package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The unigram-LM Viterbi segmentation (v4/v5's E-step) as ONE native
  * expression — the RollingWindowHashes posture: evaluated once per word
  * row, the DP is compiled Scala instead of an unrolled column tower.
  *
  * Why native: the original form unrolled dp[1..maxWord] as chained
  * `withColumn`s; Catalyst's CollapseProject then INLINES each `v_j`
  * reference into every consumer, so the expression tree grows ~4^depth —
  * the Spark-side twin of the DuckDB lateral-alias blowup documented on
  * the oracle generator (TextCatalog `unigramOracle`). At MaxWord=12 ×
  * MaxPiece=4 the analyzed/optimized/codegen'd plan cost ~5 s per query —
  * a PLAN CONSTANT independent of data (the round-12 verdict's one weak
  * item). Here the whole DP is O(maxWord·maxPiece) integer ops per word
  * row and the plan is one small projection; data cost is unchanged
  * (vocab-sized input either way).
  *
  * Semantics are EXACTLY the unrolled form's, pinned by UnigramLMSpec's
  * differential test against the retained unrolled implementation:
  *   - per-piece score = bits − shift (the load-bearing log2-probability
  *     proxy; UnigramLM scaladoc);
  *   - a (s,k) lookup missing from the current vocabulary makes that
  *     candidate `negInf` (the coalesce in the column form);
  *   - candidate k > j is `negInf` (not impossible-k-skipped);
  *   - argmax tiebreak = the when-cascade: highest k from maxPiece down
  *     whose candidate is >= EVERY lower-k candidate wins (longer piece on
  *     exact ties), else k = 1;
  *   - backpointer walk from position n, at most maxWord steps, stops when
  *     the position reaches (or overshoots below) 0 — pieces cut with SQL
  *     substring semantics;
  *   - words of length 0 or > maxWord segment to NOTHING (empty array →
  *     explode emits no rows), mirroring the column form's null-`kat`
  *     collapse for over-long words.
  *
  * Input: (word string, array<struct<s:bigint, k:bigint, b:bigint>>) — the
  * per-word hit list of vocabulary pieces at 1-based start s, length k,
  * with bit-length score b. Output: array<string> of the chosen pieces.
  */
case class UnigramViterbiSegment(
    left: Expression, right: Expression,
    maxWord: Int, maxPiece: Int, negInf: Long, shift: Long)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_viterbi_segment"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
          if s.fields.length == 3 && s.fields.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<struct<s,k,b: bigint>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(wordAny: Any, hitsAny: Any): Any = {
    val word = wordAny.asInstanceOf[UTF8String]
    val n = word.numChars()
    if (n == 0 || n > maxWord) return new GenericArrayData(Array.empty[Any])

    // (s,k) → bits lookup; Long.MinValue = "not in the current vocabulary"
    // (a real bits value is always >= 1: bitlen of a +1-ed quotient)
    val Missing = Long.MinValue
    val bits = Array.fill((n + 1) * (maxPiece + 1))(Missing)
    val hits = hitsAny.asInstanceOf[ArrayData]
    var i = 0
    while (i < hits.numElements()) {
      val h = hits.getStruct(i, 3)
      val s = h.getLong(0); val k = h.getLong(1)
      if (s >= 1 && s <= n && k >= 1 && k <= maxPiece)
        bits(s.toInt * (maxPiece + 1) + k.toInt) = h.getLong(2)
      i += 1
    }

    // dp[j] = best score of word[1..j]; kk[j] = chosen last-piece length
    val dp = new Array[Long](n + 1)
    val kk = new Array[Int](n + 1)
    val cand = new Array[Long](maxPiece + 1)
    var j = 1
    while (j <= n) {
      var k = 1
      while (k <= maxPiece) {
        cand(k) =
          if (k > j) negInf
          else {
            val b = bits((j - k + 1) * (maxPiece + 1) + k)
            if (b == Missing) negInf else dp(j - k) + (b - shift)
          }
        k += 1
      }
      // the when-cascade: k wins if its candidate >= every LOWER k's
      var kj = 1
      var best = cand(1)
      k = maxPiece
      while (k >= 2 && kj == 1) {
        var ge = true
        var k2 = 1
        while (k2 < k) { if (cand(k) < cand(k2)) ge = false; k2 += 1 }
        if (ge) kj = k
        k -= 1
      }
      k = 2
      while (k <= maxPiece) { if (cand(k) > best) best = cand(k); k += 1 }
      dp(j) = best
      kk(j) = kj
      j += 1
    }

    // backpointer walk: at most maxWord steps, SQL substring semantics
    val out = new Array[Any](maxWord)
    var m = 0
    var pos = n
    while (pos > 0 && m < maxWord) {
      val k = kk(pos)
      out(m) = word.substringSQL(pos - k + 1, k)
      pos -= k
      m += 1
    }
    new GenericArrayData(if (m == maxWord) out else out.take(m))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object UnigramViterbiSegment {
  def apply(word: Column, hits: Column,
            maxWord: Int, maxPiece: Int, negInf: Long, shift: Long): Column =
    ColumnBridge.column(new UnigramViterbiSegment(
      ColumnBridge.expression(word), ColumnBridge.expression(hits),
      maxWord, maxPiece, negInf, shift))
}
