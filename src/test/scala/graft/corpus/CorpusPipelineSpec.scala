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

  // ---- round-14: pluggable quality battery --------------------------------

  // one victim per production rule, in attribution order; all later-rule
  // victims PASS every earlier rule so the first-failing attribution is
  // exactly the rule under test
  private def wordsDoc(ws: Seq[String]) = ws.mkString(" ")
  private val fillers = (1 to 60).map(i => s"word$i")
  private def batteryDocs = Seq(
    // 101: token_count (2 tokens)
    (101L, "en", "tiny doc"),
    // 102: gopher_word_count (10 tokens — passes the 5..1000 core)
    (102L, "en", wordsDoc(fillers.take(10))),
    // 103: gopher_mean_word_len (60 single-char words)
    (103L, "en", wordsDoc(Seq.fill(60)("a"))),
    // 104: gopher_symbol_ratio (10 '#' among 55 tokens; alpha 45/55 >= 0.8)
    (104L, "en", wordsDoc(Seq("the", "of") ++ fillers.take(43) ++ Seq.fill(10)("#"))),
    // 105: gopher_alpha_frac (13 numeric tokens of 55: alpha 42/55 < 0.8)
    (105L, "en", wordsDoc(Seq("the", "of") ++ fillers.take(40) ++ (1 to 13).map(i => s"$i$i$i"))),
    // 106: gopher_stopwords (55 content words, zero en stopword hits)
    (106L, "en", wordsDoc((1 to 55).map(i => s"content$i"))),
    // 107: rep_3gram (periodic filler: 3 distinct 3-grams over 60 tokens)
    (107L, "en", wordsDoc(Seq("the", "of") ++
      Seq.fill(20)(Seq("xray", "yellow", "zebra")).flatten)),
    // 108: rep_top_bigram (13 instances of one bigram among 54 tokens,
    // separated by unique long words so no 3-gram ever repeats)
    (108L, "en", wordsDoc(Seq("the", "of") ++
      (1 to 13).flatMap(i => Seq("wonderful", "elephants", s"under$i", s"water$i")))),
    // 109: rep_dup_sentence (one 8-token sentence x4 + three unique ones)
    (109L, "en", (Seq.fill(4)("every single morning the harbour lights " +
      "flicker twice") ++ Seq(
      "meanwhile the fishing boats of the northern fleet depart slowly",
      "seagulls trail the wake hoping for discarded morning catch",
      "by noon the quay settles into its usual drowsy rhythm")).mkString(". ")),
    // 110: langid_agree (claims es, written with English stopwords)
    (110L, "es", wordsDoc(Seq("the", "of", "and", "to") ++ fillers.take(50))),
    // 111: survivor (plenty of varied words + stopwords, no repetition)
    (111L, "en", wordsDoc(Seq("the", "of") ++ (1 to 55).map(i => s"varied$i")))
  ).toDF("doc_id", "lang", "text")

  test("production quality battery: each rule drops its victim and the manifest names it") {
    val r = CorpusPipeline.run(batteryDocs, heldOut,
      quality = Quality.production(), packBudget = 64)
    val m = r.manifest.map(x => x.stage -> x.rows).toMap
    assert(m("ingest") == 11)
    assert(m("quality_drop:token_count") == 1, m.toString)
    assert(m("quality_drop:gopher_word_count") == 1, m.toString)
    assert(m("quality_drop:gopher_mean_word_len") == 1, m.toString)
    assert(m("quality_drop:gopher_symbol_ratio") == 1, m.toString)
    assert(m("quality_drop:gopher_alpha_frac") == 1, m.toString)
    assert(m("quality_drop:gopher_stopwords") == 1, m.toString)
    assert(m("quality_drop:rep_3gram") == 1, m.toString)
    assert(m("quality_drop:rep_top_bigram") == 1, m.toString)
    assert(m("quality_drop:rep_dup_sentence") == 1, m.toString)
    assert(m("quality_drop:langid_agree") == 1, m.toString)
    assert(m("quality_gate") == 1)
    val ids = r.corpus.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(111L), s"only the survivor should remain: $ids")
  }

  test("minimal preset is the historical gate: identical manifest and corpus") {
    val a = CorpusPipeline.run(docs, heldOut, packBudget = 64)
    val b = CorpusPipeline.run(docs, heldOut, packBudget = 64,
      quality = Quality.minimal(5, 1000))
    assert(a.manifest.filterNot(_.stage.startsWith("quality_drop:")) ==
      b.manifest.filterNot(_.stage.startsWith("quality_drop:")))
    assert(a.corpus.collect().map(_.toString).sorted.toSeq ==
      b.corpus.collect().map(_.toString).sorted.toSeq)
  }

  // ---- round-14: incremental mode -----------------------------------------

  // the slice: every incremental rule has a victim, ids all above the
  // corpus high-water mark (append-only contract)
  private val doc24Text = "fresh arrival describing entirely novel topics " +
    "around tidal energy storage and grid balancing economics"
  private def sliceDocs = Seq(
    // exact duplicate of corpus doc 2 -> exact_dedup vs corpus hashes
    (20L, "en", "completely different content about distributed query engines " +
      "processing immense volumes of training data every single day"),
    // near-duplicate of corpus doc 1 -> band probe match, dropped
    (21L, "en", base + " tomorrow"),
    // copies corpus doc 7's 8-token head + unique tail -> scrubbed to tail
    (22L, "en", doc7Span8 + " " + doc22Tail),
    // carries a 5-token fragment of the held-out text (below the 8-token
    // scrub window, above the 3-gram decontam shingle) -> decontaminated
    (23L, "en", "leading filler content then held out evaluation passage that " +
      "closes with harmless trailing words"),
    // clean survivor
    (24L, "en", doc24Text),
    // intra-slice near-dup of 24 -> cluster keeps the min id (24)
    (25L, "en", doc24Text + " tonight"),
    // quality victim
    (26L, "en", "tiny doc")
  ).toDF("doc_id", "lang", "text")
  private val doc22Tail = "followed by nine fresh tail words never seen anywhere else"

  test("incremental slice against captured state ≡ full rebuild of corpus ∪ slice") {
    val base = CorpusPipeline.run(docs, heldOut,
      exactSubstrWindow = 8, packBudget = 64, captureState = true)
    val state = base.state.get
    assert(state.maxDocId == 7L)

    val inc = CorpusPipeline.runIncremental(sliceDocs, state, packBudget = 64)
    val m = inc.manifest.map(x => x.stage -> x.rows).toMap
    assert(m("ingest") == 7)
    assert(m("quality_gate") == 6)           // 26 gone
    assert(m("exact_dedup") == 5, m.toString)            // 20 gone (dup of corpus 2)
    assert(m("near_dup_dedup") == 3, m.toString)         // 21 (corpus match), 25 (intra) gone
    assert(m("exact_substring_scrub") == 3, m.toString)  // 22 rewritten, none fully erased
    assert(m("decontaminated") == 2, m.toString)         // 23 gone
    assert(m("packed_sharded") == 2, m.toString)         // 22 (tail), 24

    // THE equivalence gate (the i7 incremental ≡ recompute technique):
    // a full rebuild over corpus ∪ slice must agree row-for-row on
    // (doc_id, lang, n_tokens, shard). The rebuild runs under the BASE
    // corpus's PINNED tokenizer — the same artifact the incremental mode
    // reuses (retraining per slice is the documented divergence: a
    // rebuild that retrains shifts merge ranks and with them every
    // n_tokens, which is exactly why production pins tokenizers across
    // corpus versions). bin_id is layout (the appended bins pack the
    // slice alone above the high-water bin; a rebuild packs globally)
    // and is gated structurally below.
    val full = CorpusPipeline.run(docs.unionByName(sliceDocs), heldOut,
      exactSubstrWindow = 8, packBudget = 64,
      pinnedTokenizer = Some((base.merges, base.unigramVocab)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang", "n_tokens", "shard")
        .collect().map(_.toString).sorted.toSeq
    assert(rows(inc.corpus) == rows(full.corpus))

    // append-only structure: corpus rows untouched, slice bins above the
    // high-water mark, exactly-once packing, budget respected
    assert(rows(inc.corpus.filter($"doc_id" <= 7)) == rows(base.corpus))
    val newRows = inc.corpus.filter($"doc_id" > 7).collect()
    assert(newRows.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(22L, 24L))
    assert(newRows.forall(_.getAs[Long]("bin_id") > state.maxBinId))
    assert(newRows.map(_.getAs[Long]("doc_id")).distinct.length == newRows.length)

    // 22 was scrubbed to its tail: its token count must equal a fresh
    // count of the tail under the corpus tokenizer, not the full text
    val full22 = full.corpus.filter($"doc_id" === 22).head.getAs[Int]("n_tokens")
    val inc22 = inc.corpus.filter($"doc_id" === 22).head.getAs[Int]("n_tokens")
    assert(inc22 == full22)
  }

  test("CorpusState round-trips through parquet: a loaded state drives an identical incremental run") {
    val base = CorpusPipeline.run(docs, heldOut,
      exactSubstrWindow = 8, packBudget = 64, captureState = true)
    val dir = java.nio.file.Files.createTempDirectory("corpus_state").toString
    try {
      CorpusPipeline.CorpusState.write(base.state.get, dir)
      val loaded = CorpusPipeline.CorpusState.load(spark, dir)
      assert(loaded.exactSubstrWindow == 8)
      assert(loaded.tokenizer == "bpe")
      assert(loaded.maxDocId == base.state.get.maxDocId)
      assert(loaded.maxBinId == base.state.get.maxBinId)
      assert(loaded.merges == base.merges)
      assert(java.util.Arrays.equals(loaded.bloom, base.state.get.bloom))
      val viaMem = CorpusPipeline.runIncremental(sliceDocs, base.state.get, packBudget = 64)
      val viaDisk = CorpusPipeline.runIncremental(sliceDocs, loaded, packBudget = 64)
      assert(viaDisk.manifest == viaMem.manifest)
      assert(viaDisk.corpus.collect().map(_.toString).sorted.toSeq ==
        viaMem.corpus.collect().map(_.toString).sorted.toSeq)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("rolled state: a second slice dedups against the first slice's survivors") {
    val base = CorpusPipeline.run(docs, heldOut,
      exactSubstrWindow = 8, packBudget = 64, captureState = true)
    val inc1 = CorpusPipeline.runIncremental(sliceDocs, base.state.get, packBudget = 64)
    val rolled = inc1.state.get
    assert(rolled.maxDocId == 26L)

    val slice2 = Seq(
      (30L, "en", doc24Text), // exact dup of slice-1 survivor 24
      (31L, "en", "genuinely new final document mentioning geothermal " +
        "district heating pilots across several northern municipalities")
    ).toDF("doc_id", "lang", "text")
    val inc2 = CorpusPipeline.runIncremental(slice2, rolled, packBudget = 64)
    val m = inc2.manifest.map(x => x.stage -> x.rows).toMap
    assert(m("exact_dedup") == 1, m.toString) // 30 gone via rolled contentHashes
    assert(m("packed_sharded") == 1)
    val ids = inc2.corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 7L, 22L, 24L, 31L), ids.toString)
    // and the id contract is enforced
    val bad = Seq((5L, "en", "id below the high-water mark " + doc24Text))
      .toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException](
      CorpusPipeline.runIncremental(bad, inc2.state.get, packBudget = 64))
    assert(e.getMessage.contains("append-only"))
  }

  // ---- round-15: incremental semantic probe --------------------------------

  test("incremental semantic probe: a slice doc semantically duplicating a corpus " +
      "doc drops via the stored centroids and cell members, and the members roll forward") {
    val b = CorpusPipeline.run(extendedDocs, heldOut, embeddings = Some(embeddings),
      exactSubstrWindow = 8, semK = 2, semIters = 2, packBudget = 64,
      captureState = true)
    val state = b.state.get
    // captured semantic state: centroids + the FINAL corpus docs' vectors
    // (corpus = {1,7,8}; embeddings exist for {1,7})
    assert(!state.semCentroids.isEmpty)
    val memberIds = state.semCellMembers.select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(memberIds == Set(1L, 7L), memberIds.toString)

    val slice = Seq(
      (40L, "en", "wholly different wording yet covering the very same " +
        "underlying semantic topic as the canonical first document"),
      (41L, "en", "an orthogonal subject matter piece exploring deep sea " +
        "cartography instruments and their calibration routines"),
      (42L, "en", "a document carrying no embedding row which must always " +
        "pass the semantic stage untouched")).toDF("doc_id", "lang", "text")
    val sliceEmb = Seq(
      (40L, Seq(0.999, 0.045, 0.0, 0.0)), // cosine ≈ 1 with corpus doc 1
      (41L, Seq(0.0, 0.0, 1.0, 0.0))      // similar to nothing stored
    ).toDF("doc_id", "embedding")

    val inc = CorpusPipeline.runIncremental(slice, state, packBudget = 64,
      embeddings = Some(sliceEmb))
    val m = inc.manifest.map(x => x.stage -> x.rows).toMap
    assert(m("exact_substring_scrub") == 3, m.toString)
    assert(m("semantic_dedup") == 2, m.toString) // 40 gone (dup of corpus 1)
    val ids = inc.corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(40L) && ids.contains(41L) && ids.contains(42L), ids.toString)

    // without slice embeddings the probe stage is off (no manifest row)
    val noEmb = CorpusPipeline.runIncremental(slice, state, packBudget = 64)
    assert(!noEmb.manifest.exists(_.stage == "semantic_dedup"))
    assert(noEmb.corpus.filter($"doc_id" === 40L).count() == 1)

    // the survivor's vector rolled into the members, so a second slice
    // doc semantically duplicating IT drops too
    val rolled = inc.state.get
    val rolledIds = rolled.semCellMembers.select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(rolledIds == Set(1L, 7L, 41L), rolledIds.toString)
    val slice2 = Seq(
      (50L, "en", "fresh phrasing that semantically mirrors the deep sea " +
        "cartography piece from the previous slice entirely")).toDF("doc_id", "lang", "text")
    val slice2Emb = Seq((50L, Seq(0.001, 0.0, 0.999, 0.0))).toDF("doc_id", "embedding")
    val inc2 = CorpusPipeline.runIncremental(slice2, rolled, packBudget = 64,
      embeddings = Some(slice2Emb))
    assert(inc2.corpus.filter($"doc_id" === 50L).count() == 0,
      "slice-2 semantic dup of the rolled-in slice-1 survivor must drop")

    // a parquet round-trip of the state drives the identical probe
    val dir = java.nio.file.Files.createTempDirectory("sem_state").toString
    try {
      CorpusPipeline.CorpusState.write(state, dir)
      val loaded = CorpusPipeline.CorpusState.load(spark, dir)
      assert(loaded.semThreshold == state.semThreshold)
      assert(loaded.semMaxCell == state.semMaxCell)
      val viaDisk = CorpusPipeline.runIncremental(slice, loaded, packBudget = 64,
        embeddings = Some(sliceEmb))
      assert(viaDisk.corpus.collect().map(_.toString).sorted.toSeq ==
        inc.corpus.collect().map(_.toString).sorted.toSeq)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }

    // shipping slice embeddings against a semantic-state-less corpus is
    // a caller error, not a silent skip
    val plainState = CorpusPipeline.run(docs, heldOut,
      exactSubstrWindow = 8, packBudget = 64, captureState = true).state.get
    val e = intercept[IllegalArgumentException](
      CorpusPipeline.runIncremental(slice, plainState, packBudget = 64,
        embeddings = Some(sliceEmb)))
    assert(e.getMessage.contains("no semantic state"))
  }

  // ---- round-15: hot-bucket freezing + write-into-load-dir guard ----------

  test("a bucket that crosses the cap during a slice stays a frozen membership row " +
      "and later slices still near-dup-match its template") {
    // maxBucket = 3. Base corpus holds TWO near-dup variants of the
    // template (bucket cnt = 2, under the cap); slice 1 adds two more
    // (merged cnt 4 -> frozen at 3 — the cap crossing happens DURING the
    // slice merge, the exact scenario the round-14 code deleted the
    // bucket in); slice 2's variant must still match and drop, under both
    // the in-memory rolled state and a parquet round-trip of it.
    val cap = 3
    val templated = docs.unionByName(Seq(
      (8L, "en", base + " yesterday")).toDF("doc_id", "lang", "text"))
    val b = CorpusPipeline.run(templated, heldOut,
      exactSubstrWindow = 8, packBudget = 64, maxBucket = cap, captureState = true)
    val state = b.state.get

    val slice1 = Seq(
      (20L, "en", base + " tomorrow"),
      (21L, "en", base + " someday")).toDF("doc_id", "lang", "text")
    val inc1 = CorpusPipeline.runIncremental(slice1, state,
      packBudget = 64)
    val m1 = inc1.manifest.map(x => x.stage -> x.rows).toMap
    assert(m1("near_dup_dedup") == 0, m1.toString) // both variants match the corpus
    val rolled = inc1.state.get
    // the template's bucket crossed the cap in the merge (2 corpus + 2
    // slice) and must now be FROZEN at the cap, not deleted
    val frozen = rolled.bandIndex.filter(col("cnt") === cap).count()
    assert(frozen > 0, "expected a saturated (frozen) bucket after the cap crossing")

    val slice2 = Seq(
      (30L, "en", base + " perhaps"), // near-dup of the now-hot template
      (31L, "en", "an unrelated survivor document about volcanic soil " +
        "composition across island chains and their farming impact")
    ).toDF("doc_id", "lang", "text")

    val inc2 = CorpusPipeline.runIncremental(slice2, rolled,
      packBudget = 64)
    val ids2 = inc2.corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids2.contains(30L),
      "slice-2 near-dup of the hot template must drop via the frozen bucket")
    assert(ids2.contains(31L))

    // identical behavior when the rolled state round-trips through parquet
    val dir = java.nio.file.Files.createTempDirectory("rolled_state").toString
    try {
      CorpusPipeline.CorpusState.write(rolled, dir)
      val loaded = CorpusPipeline.CorpusState.load(spark, dir)
      val viaDisk = CorpusPipeline.runIncremental(slice2, loaded,
        packBudget = 64)
      assert(viaDisk.corpus.collect().map(_.toString).sorted.toSeq ==
        inc2.corpus.collect().map(_.toString).sorted.toSeq)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("CorpusState.write refuses a directory the state itself reads from") {
    val b = CorpusPipeline.run(docs, heldOut,
      exactSubstrWindow = 8, packBudget = 64, captureState = true)
    val dirA = java.nio.file.Files.createTempDirectory("state_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("state_b").toString
    try {
      CorpusPipeline.CorpusState.write(b.state.get, dirA)
      val loaded = CorpusPipeline.CorpusState.load(spark, dirA)
      // writing a LOADED state back over its own inputs is the daily-roll
      // corruption pattern (round-14 ADVICE): overwrite deletes the lazy
      // scans' source files mid-read
      val e = intercept[IllegalArgumentException](
        CorpusPipeline.CorpusState.write(loaded, dirA))
      assert(e.getMessage.contains("INPUT of the state"))
      // a rolled-forward state derived from the loaded one is equally lazy
      // over dirA and must be refused too
      val slice = Seq((20L, "en", "a fresh slice document about offshore " +
        "wind maintenance logistics and crew transfer scheduling"))
        .toDF("doc_id", "lang", "text")
      val rolled = CorpusPipeline.runIncremental(slice, loaded, packBudget = 64)
        .state.get
      val e2 = intercept[IllegalArgumentException](
        CorpusPipeline.CorpusState.write(rolled, dirA))
      assert(e2.getMessage.contains("INPUT of the state"))
      // a fresh directory is the supported path
      CorpusPipeline.CorpusState.write(rolled, dirB)
      val reloaded = CorpusPipeline.CorpusState.load(spark, dirB)
      assert(reloaded.maxDocId == rolled.maxDocId)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dirA)); rm(new java.io.File(dirB))
    }
  }

  test("load tolerates a pre-v2 state layout: missing semantic tables and " +
      "meta columns default instead of failing (round-15 ADVICE)") {
    val b = CorpusPipeline.run(docs, heldOut,
      exactSubstrWindow = 8, packBudget = 64, captureState = true)
    val dir = java.nio.file.Files.createTempDirectory("state_prev2").toString
    try {
      CorpusPipeline.CorpusState.write(b.state.get, dir)
      // doctor the directory into the pre-v2 (round ≤14) shape: meta with
      // only the six core columns, no semantic tables on disk
      val oldMeta = spark.read.parquet(s"$dir/meta")
        .select("exact_substr_window", "decontam_shingle", "tokenizer",
          "max_doc_id", "max_bin_id", "bloom")
        .collect()
      val tmp = java.nio.file.Files.createTempDirectory("state_prev2_meta").toString
      spark.createDataFrame(
          spark.sparkContext.parallelize(oldMeta.toIndexedSeq),
          spark.read.parquet(s"$dir/meta").select("exact_substr_window",
            "decontam_shingle", "tokenizer", "max_doc_id", "max_bin_id",
            "bloom").schema)
        .write.mode("overwrite").parquet(s"$tmp/meta")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(s"$dir/meta"))
      rm(new java.io.File(s"$dir/sem_centroids"))
      rm(new java.io.File(s"$dir/sem_cell_members"))
      new java.io.File(s"$tmp/meta").renameTo(new java.io.File(s"$dir/meta"))

      val loaded = CorpusPipeline.CorpusState.load(spark, dir)
      assert(loaded.maxBucket == CorpusPipeline.MaxBucket)
      assert(loaded.semCentroids.isEmpty && loaded.semCellMembers.isEmpty)
      // non-semantic probes run as before
      val slice = Seq((30L, "en", "a brand new slice document about glacier " +
        "monitoring radar networks and seasonal melt forecasting models"))
        .toDF("doc_id", "lang", "text")
      val inc = CorpusPipeline.runIncremental(slice, loaded, packBudget = 64)
      assert(inc.corpus.select("doc_id").collect().map(_.getLong(0)).contains(30L))
      // a semantic probe against the defaulted empty state stays loud
      val e = intercept[IllegalArgumentException](
        CorpusPipeline.runIncremental(slice, loaded, packBudget = 64,
          embeddings = Some(Seq((30L, Seq(1.0, 0.0)))
            .toDF("doc_id", "embedding"))))
      assert(e.getMessage.contains("no semantic state"))
      // and loadBucketed refuses the non-bucketed layout loudly
      val e2 = intercept[IllegalArgumentException](
        CorpusPipeline.CorpusState.loadBucketed(spark, dir, "graft_prev2"))
      assert(e2.getMessage.contains("bucket count"))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
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
