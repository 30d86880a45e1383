package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end composition check: a crafted corpus where every stage has a
  * known victim, and the manifest accounts for each one. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while " +
    "seven wizards brew strong coffee at dawn near the old stone bridge"

  private def docs = Seq(
    // survivors
    (1L, "en", base),
    (2L, "en", "completely different content about distributed query engines " +
      "processing immense volumes of training data every single day"),
    // exact duplicate of 1 (differs only in case/padding -> same canonical hash)
    (3L, "en", "  " + base.toUpperCase.toLowerCase + " "),
    // near-duplicate of 1 (one word appended -> jaccard n/(n+1) ≈ 0.95,
    // LSH collision with the fixed seeds — deterministic, no RNG)
    (4L, "en", base + " tonight"),
    // too short -> quality gate
    (5L, "en", "tiny doc"),
    // contaminated: contains a full 13+-word span from the held-out set
    (6L, "en", "prefix words then " + heldOutText + " and a suffix tail here"),
    (7L, "en", "an entirely separate clean document describing benchmark " +
      "suites measuring shuffle throughput under concurrent analytical load")
  ).toDF("doc_id", "lang", "text")

  private val heldOutText = "held out evaluation passage that must never " +
    "leak into any training corpus under any circumstances at all"

  private def heldOut = Seq((100L, "en", heldOutText)).toDF("doc_id", "lang", "text")

  test("every stage drops its victim and the manifest accounts for it") {
    val r = CorpusPipeline.run(docs, heldOut, packBudget = 64)
    val m = r.manifest.map(x => x.stage -> x.rows).toMap
    assert(m("ingest") == 7)
    assert(m("quality_gate") == 6)     // doc 5 gone
    assert(m("exact_dedup") == 5)      // doc 3 gone (doc 1 canonical)
    assert(m("near_dup_dedup") == 4)   // doc 4 gone (doc 1 kept)
    assert(m("decontaminated") == 3)   // doc 6 gone
    val ids = r.corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 7L))
    assert(m("packed_sharded") == 3)
  }

  // ---- round-13 stages: ExactSubstr scrub, SemDeDup, unigram tokenizer ----

  // doc 8: copies doc 2's first 8 tokens, then a unique tail — the window
  // under the copied span is a later occurrence and gets erased, the tail
  // survives. doc 9: ENTIRELY an 8-token span of doc 7 — fully erased,
  // dropped. (doc_id order makes docs 2/7 the first occurrences.)
  private val doc2Head8 = "completely different content about distributed " +
    "query engines processing"
  private val doc8Tail = "followed by nine fresh tail words never seen anywhere else"
  private val doc7Span8 = "entirely separate clean document describing " +
    "benchmark suites measuring"
  private def extendedDocs = docs.unionByName(Seq(
    (8L, "en", doc2Head8 + " " + doc8Tail),
    (9L, "en", doc7Span8)).toDF("doc_id", "lang", "text"))

  // embeddings: docs 1/2/6 near-parallel (one semantic group), doc 7
  // orthogonal, docs 8/9 none (must pass through). Centroid-distance keep:
  // doc 1 sits farthest from the group's mean, so the paper's rule keeps 1
  // and drops 2 and 6.
  private def embeddings = Seq(
    (1L, Seq(1.0, 0.0, 0.0, 0.0)),
    (2L, Seq(0.998, 0.05, 0.0, 0.0)),
    (6L, Seq(0.997, 0.06, 0.0, 0.0)),
    (7L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("doc_id", "embedding")

  test("ExactSubstr.scrub erases later duplicate spans and drops fully-copied docs") {
    val scrubbed = graft.operators.ExactSubstr.scrub(extendedDocs, 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(!scrubbed.contains(9L), "doc 9 (entirely a copied span) must drop out")
    assert(scrubbed(8L) == doc8Tail, s"doc 8 must keep only its tail: '${scrubbed(8L)}'")
    // first occurrences untouched (texts are already lowercase single-space)
    assert(scrubbed(2L) == docs.filter($"doc_id" === 2).head.getString(2))
    assert(scrubbed(7L) == docs.filter($"doc_id" === 7).head.getString(2))
  }

  test("ExactSubstr.scrub preserveCase keeps original casing while matching case-insensitively") {
    // doc 10 carries mixed casing AND copies doc 2's 8-token head in a
    // DIFFERENT casing: the span must still be erased (hashes are over the
    // lowercased stream), and the surviving tail must keep its casing.
    val casedTail = "Followed By Nine FRESH Tail Words Never Seen ANYWHERE else"
    val cased = docs.unionByName(Seq(
      (10L, "en", doc2Head8.toUpperCase + " " + casedTail)).toDF("doc_id", "lang", "text"))
    val out = graft.operators.ExactSubstr.scrub(cased, 8, preserveCase = true)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out(10L) == casedTail, s"cased tail must survive intact: '${out(10L)}'")
    // first occurrences keep their original text verbatim
    assert(out(2L) == docs.filter($"doc_id" === 2).head.getString(2))
    // and the erased positions are IDENTICAL to the lowercase mode's
    val lowered = graft.operators.ExactSubstr.scrub(cased, 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(lowered.keySet == out.keySet)
    assert(lowered(10L) == casedTail.toLowerCase)
  }

  test("full pipeline with ExactSubstr and SemDeDup stages: every victim accounted") {
    val r = CorpusPipeline.run(extendedDocs, heldOut, embeddings = Some(embeddings),
      exactSubstrWindow = 8, semK = 2, semIters = 2, packBudget = 64)
    val m = r.manifest.map(x => x.stage -> x.rows).toMap
    assert(m("ingest") == 9)
    assert(m("quality_gate") == 8)            // doc 5 gone
    assert(m("exact_dedup") == 7)             // doc 3 gone
    assert(m("near_dup_dedup") == 6)          // doc 4 gone
    assert(m("exact_substring_scrub") == 5)   // doc 9 gone (doc 8 rewritten)
    assert(m("semantic_dedup") == 3)          // docs 2 and 6 gone (1 kept:
                                              // farthest from the group mean)
    assert(m("decontaminated") == 3)          // doc 6 already semantic-dropped
    val ids = r.corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 7L, 8L), s"final corpus wrong: $ids")
    // determinism across runs, with every new stage in the chain
    val again = CorpusPipeline.run(extendedDocs, heldOut, embeddings = Some(embeddings),
      exactSubstrWindow = 8, semK = 2, semIters = 2, packBudget = 64)
    assert(again.corpus.collect().map(_.toString).sorted.toSeq ==
      r.corpus.collect().map(_.toString).sorted.toSeq)
  }

  test("unigram tokenizer path: v4 vocabulary + v5 segmentation drive the token counts") {
    val r = CorpusPipeline.run(docs, heldOut, tokenizer = "unigram", packBudget = 64)
    val m = r.manifest.map(x => x.stage -> x.rows).toMap
    assert(m("packed_sharded") == 3)
    val ids = r.corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 7L))
    assert(r.merges.isEmpty)
    assert(r.unigramVocab.nonEmpty)
    assert(!r.unigramVocab.exists(_._1.length > 4), "piece longer than MaxPiece leaked")
    assert(r.corpus.collect().forall(_.getAs[Int]("n_tokens") > 0))
  }

  test("token counts, packing, and shards are consistent") {
    val r = CorpusPipeline.run(docs, heldOut, packBudget = 64)
    val rows = r.corpus.collect()
    // n_tokens: positive, bounded by the gate ceiling; shard within range
    assert(rows.forall(_.getAs[Int]("n_tokens") > 0))
    assert(rows.forall { x =>
      val s = x.getAs[Long]("shard"); s >= 0 && s < 8
    })
    // exactly-once packing: every surviving doc appears once with a bin
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    // BPE learned a full merge table on this corpus
    assert(r.merges.size == 8)
    // determinism: a second run is identical
    val again = CorpusPipeline.run(docs, heldOut, packBudget = 64)
    assert(again.corpus.collect().map(_.toString).sorted.toSeq ==
      rows.map(_.toString).sorted.toSeq)
    assert(again.merges == r.merges)
  }
}
