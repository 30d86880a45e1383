package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ExactSubstr corpus scrubbing (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better") as a reusable operator on arbitrary
  * document frames — the DataFrame-level form of the oracle-gated
  * `d14_exact_substring_dedup` catalog entry, extracted so the corpus
  * capstone (graft.corpus.CorpusPipeline) can compose it mid-pipeline.
  *
  * Rule (identical to d14, whose scaladoc carries the full scale argument):
  * hash every stride-1 `w`-token window — one md5 per TOKEN (the
  * string→int bridge), then a native rolling 3×31-bit polynomial pass per
  * document (graft.functions.RollingWindowHashes, O(tokens) per doc) —
  * find each window's global first occurrence as a map-side-combined MIN
  * over a packed (doc_id, pos) long, and erase the `w` tokens under every
  * LATER occurrence (self-overlapping occurrences included — periodic
  * filler erases itself down to its head; the d14 contract). Documents are
  * rebuilt from their kept tokens.
  *
  * Pipeline-shape differences from the catalog entry (both deliberate):
  *  - the rebuilt `text` is the whitespace-normalized LOWERCASE token
  *    stream — the tokenizer's view of the document, which is what every
  *    downstream corpus stage consumes;
  *  - a document whose EVERY token was erased (it is entirely a later copy
  *    of spans seen elsewhere) is DROPPED, not kept as an empty row — the
  *    manifest-visible outcome a corpus pipeline wants.
  *
  * Contract inherited from d14: doc ids must fit in 31 bits and token
  * positions in 32 (the pk packing); shuffles are keyed on window hashes
  * (uniform) and doc ids — no skew funnel, the HAVING n>1 filter bounds
  * the position fan-out to duplicated windows only.
  */
object ExactSubstr {

  /** Scrub `docs` (must carry `doc_id` and `textCol`; other columns pass
    * through). Returns the input columns with `textCol` rebuilt from the
    * kept tokens; fully-erased documents are dropped.
    *
    * `preserveCase = true` keeps each surviving token's ORIGINAL casing in
    * the rebuilt text while still MATCHING case-insensitively: window
    * hashes are always computed over the lowercased token stream (so "The
    * Quick Brown…" and "the quick brown…" erase each other exactly as
    * before), only the rebuild source changes — for pipelines with a
    * case-sensitive consumer downstream of the scrub (round-13 verdict).
    * The default (false) remains the tokenizer's lowercased view. */
  def scrub(docs: DataFrame, w: Int, textCol: String = "text",
            preserveCase: Boolean = false): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    val rebuildToks =
      if (preserveCase) split(col(textCol), " ") else split(lower(col(textCol)), " ")
    val t = docs.filter(col(textCol).isNotNull)
      .select(col("doc_id"), rebuildToks.as("_t"))
      .filter(size(col("_t")) > 0)
      // hash input is ALWAYS the lowercased token — erasure positions are
      // identical under both rebuild modes by construction
      .withColumn("_tv",
        transform(col("_t"), tok => conv(substring(md5(lower(tok)), 1, 15), 16, 10).cast("long")))
    val wins = t.select(col("doc_id"),
        explode(graft.functions.RollingWindowHashes(col("_tv"), w)).as("x"))
      .select(col("doc_id"), col("x.pos"), col("x.h1"), col("x.h2"), col("x.h3"),
        (col("doc_id").cast("long") * lit(4294967296L) + col("x.pos")).as("pk"))
    val dups = wins.groupBy(col("h1"), col("h2"), col("h3"))
      .agg(min(col("pk")).as("first_pk"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("h1"), col("h2"), col("h3"), col("first_pk"))
    val removed = wins.join(dups, Seq("h1", "h2", "h3"))
      .filter(col("pk") =!= col("first_pk"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (w - 1))).as("tokpos"))
      .distinct()
    val tokens = t.select(col("doc_id"), posexplode(col("_t")).as(Seq("p0", "w")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("tokpos"), col("w"))
    val rebuilt = tokens.join(removed, Seq("doc_id", "tokpos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("tokpos"), col("w")))),
          s => s("w")), " ").as("_scrubbed"))
    docs.drop(textCol) // inner join: fully-erased docs drop out here
      .join(rebuilt, "doc_id")
      .withColumnRenamed("_scrubbed", textCol)
  }
}
