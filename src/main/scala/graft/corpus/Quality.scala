package graft.corpus

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One named keep-predicate of the corpus pipeline's quality gate. `keep`
  * is a boolean Column over the gate's working frame, which carries the
  * document columns plus `_toks` (the lowercased whitespace token array,
  * prepared once for all rules). Rules AND together; the pipeline
  * attributes each dropped document to the FIRST rule (in list order)
  * that rejected it and reports a per-rule drop count in the manifest —
  * so corpus shrinkage is auditable per rule, not just per stage. */
final case class QualityRule(name: String, keep: Column)

/** The quality-rule presets the capstone's stage 1 accepts — each rule is
  * the SAME signal an oracle-gated catalog entry checks one at a time
  * (t7 Gopher battery, t6/t14 repetition, t1 language-id), re-expressed
  * as a per-row predicate so the whole battery stays a map-only scan-side
  * gate: no rule below aggregates, shuffles, or leaves the row.
  *
  * [[Quality.minimal]] is the pipeline's historical token-count core;
  * [[Quality.production]] is the full pretraining battery (Rae et al.
  * "Gopher" §A2, repeated by C4/FineWeb/CCNet pipelines). */
object Quality {

  private def toks: Column = col("_toks")
  private def nWords: Column = size(toks)

  /** The minimal preset: the token-count window alone. */
  def minimal(minTokens: Int, maxTokens: Int): Seq[QualityRule] =
    Seq(tokenCount(minTokens, maxTokens))

  def tokenCount(minTokens: Int, maxTokens: Int): QualityRule =
    QualityRule("token_count", nWords.between(minTokens, maxTokens))

  /** t7's Gopher battery as five individually-named rules, so the
    * manifest says WHICH signal rejected a document. Thresholds are the
    * t7 entry's (the published Gopher §A2 values). */
  def gopher(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2): Seq[QualityRule] = {
    val sumLen = aggregate(toks, lit(0), (acc, x) => acc + length(x))
    val meanLen = sumLen * lit(1.0) / nWords
    val hashCnt = length(col("text")) - length(replace(col("text"), lit("#"), lit("")))
    val ellCnt = (length(col("text"))
      - length(replace(col("text"), lit("..."), lit("")))) / lit(3)
    val alphaFrac = size(filter(toks, x => x.rlike("[a-z]"))) * lit(1.0) / nWords
    Seq(
      QualityRule("gopher_word_count", nWords.between(minWords, maxWords)),
      QualityRule("gopher_mean_word_len",
        meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen),
      QualityRule("gopher_symbol_ratio",
        (hashCnt + ellCnt) * lit(1.0) / nWords <= maxSymbolRatio),
      QualityRule("gopher_alpha_frac", alphaFrac >= minAlphaFrac),
      QualityRule("gopher_stopwords", stopHits("en") >= minStopHits))
  }

  /** The t1/t7 stopword-hit scorer for one language — the identical hit
    * rule (instance-counting filter, not a deduping intersect) over the
    * identical seed lists the catalog entries are oracle-gated on. */
  private def stopHits(lang: String): Column = {
    val words = graft.catalog.TextCatalog.stopwords(lang)
    size(filter(toks, x => array_contains(array(words.map(lit): _*), x)))
  }

  /** t6/t14's repetition family, per-row:
    *  - `rep_3gram`: 1 − distinct/total word-3-gram windows ≤ max (t6's
    *    dup_ratio — the boilerplate signal);
    *  - `rep_top_bigram`: the most frequent bigram's instance share ≤ max
    *    (t14's first flag, Gopher's 0.18) — computed as the longest equal
    *    run of the SORTED bigram array, an O(n log n) per-row fold, no
    *    per-doc aggregation stage;
    *  - `rep_dup_sentence`: duplicate-sentence share ≤ max (t14's second
    *    flag, Gopher's 0.30).
    * Documents too short to carry the signal (no bigrams / no sentences)
    * pass — a rule abstains where its statistic is undefined. */
  def repetition(
      maxDup3gramRatio: Double = 0.5,
      maxTopBigramShare: Double = 0.18,
      maxDupSentShare: Double = 0.30): Seq[QualityRule] = {
    val n3 = greatest(nWords - 2, lit(0))
    // t6's 3-gram windows come from the SAME shingle machinery the d2/t6
    // entries use, so the signal cannot drift from its oracle-gated twin
    val dup3 = lit(1.0) -
      size(graft.functions.WordShingles(col("text"), 3)).cast("double") / n3
    val bigrams = filter(
      zip_with(toks, slice(toks, lit(2), greatest(nWords - 1, lit(0))),
        (a, b) => when(b.isNotNull, concat_ws(" ", a, b))),
      g => g.isNotNull)
    // longest equal run of the sorted bigram array = the top bigram's
    // count: an O(n log n) sort + O(n) fold, entirely inside the row
    // (the t14 entry computes the same statistic by explode+groupBy for
    // its oracle; per-row the fold avoids a per-doc aggregation stage)
    val topRun = aggregate(
      array_sort(bigrams),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x <=> acc("prev"), acc("run") + 1L).otherwise(1L)
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    val sents = filter(split(lower(col("text")), "\\. "), s => s =!= "")
    val nSent = size(sents)
    val nDupSent = nSent - size(array_distinct(sents))
    Seq(
      QualityRule("rep_3gram", n3 === 0 || dup3 <= maxDup3gramRatio),
      QualityRule("rep_top_bigram",
        size(bigrams) === 0 ||
          topRun.cast("double") / size(bigrams) <= maxTopBigramShare),
      QualityRule("rep_dup_sentence",
        nSent === 0 || nDupSent.cast("double") / nSent <= maxDupSentShare))
  }

  /** t1's language-id chain as a confirmation rule: where the claimed
    * `lang` is inside the classifier's domain (en/es/de/fr stopword
    * scoring), the argmax must AGREE with it — the CCNet posture of
    * dropping documents whose content contradicts their metadata
    * language. Claims outside the domain pass (the classifier abstains
    * rather than vetoing languages it cannot score). */
  def langIdAgrees: QualityRule = {
    val en = stopHits("en"); val es = stopHits("es")
    val de = stopHits("de"); val fr = stopHits("fr")
    val predicted =
      when(en >= es && en >= de && en >= fr, "en")
        .when(es >= de && es >= fr, "es")
        .when(de >= fr, "de")
        .otherwise("fr")
    QualityRule("langid_agree",
      !col("lang").isInCollection(Seq("en", "es", "de", "fr")) ||
        predicted === col("lang"))
  }

  /** The production preset: token window, Gopher battery, repetition
    * family, language confirmation — first-failing-rule drop attribution
    * in exactly this order. */
  def production(minTokens: Int = 5, maxTokens: Int = 1000): Seq[QualityRule] =
    tokenCount(minTokens, maxTokens) +: (gopher() ++ repetition() :+ langIdAgrees)
}
