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
