package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Round-15 verdict #7: the streamed daily mode must be the batch chain
  * in different clothing — N one-slice triggers through
  * [[StreamingIngest]] produce the IDENTICAL corpus (doc_id, lang,
  * n_tokens, bin_id, shard — full row multiset) to N driver-side
  * [[CorpusPipeline.runIncremental]] steps over the same slices, and the
  * per-trigger state rotation leaves exactly one committed state
  * directory behind. */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while " +
    "seven wizards brew strong coffee at dawn near the old stone bridge"
  private val heldOutText = "held out evaluation passage that must never " +
    "leak into any training corpus under any circumstances at all"

  private def corpusDocs = Seq(
    (1L, "en", base),
    (2L, "en", "completely different content about distributed query engines " +
      "processing immense volumes of training data every single day"),
    (7L, "en", "an entirely separate clean document describing benchmark " +
      "suites measuring shuffle throughput under concurrent analytical load")
  ).toDF("doc_id", "lang", "text")

  private def heldOut = Seq((900L, "en", heldOutText)).toDF("doc_id", "lang", "text")

  /** Slice i: one genuinely new doc, one exact dup of corpus doc 2, one
    * near-dup of corpus doc 1, and (slice 2 only) a decontamination
    * victim — every cross-slice probe fires against the ROLLED state. */
  private def sliceDocs(i: Int): DataFrame = {
    val uniq = (0 until 8).map(w => s"s${i}word$w").mkString(" ")
    val rows = Seq(
      (i * 100L + 1L, "en", uniq),
      (i * 100L + 2L, "en", "completely different content about distributed " +
        "query engines processing immense volumes of training data every single day"),
      (i * 100L + 3L, "en", base + s" slice${i}tail")
    ) ++ (if (i == 2)
      Seq((i * 100L + 4L, "en", s"s${i}prefix " + heldOutText + s" s${i}suffix"))
    else Nil)
    rows.toDF("doc_id", "lang", "text")
  }

  private def rowKey(df: DataFrame): Seq[String] =
    df.select("doc_id", "lang", "n_tokens", "bin_id", "shard")
      .collect().map(_.toString).sorted.toSeq

  test("N-trigger streamed ingest == N-slice batch chain, with state rotation") {
    val work = java.nio.file.Files.createTempDirectory("streaming-ingest").toString
    val staged = java.nio.file.Paths.get(work, "slices")
    java.nio.file.Files.createDirectories(staged)

    // stage each slice as ONE parquet file with strictly increasing
    // mtimes: the file source must deliver slice i before slice i+1 (the
    // append-only id contract; a mis-ordered delivery fails loudly in
    // runIncremental's require, so ordering bugs can't pass silently)
    val slices = (1 to 3).map(sliceDocs)
    slices.zipWithIndex.foreach { case (df, i0) =>
      val i = i0 + 1
      val tmp = java.nio.file.Paths.get(work, s"tmp_$i")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator()
      val src = {
        var found: java.nio.file.Path = null
        while (part.hasNext) {
          val p = part.next()
          if (p.getFileName.toString.endsWith(".parquet")) found = p
        }
        found
      }
      val dst = staged.resolve(f"slice_$i%04d.parquet")
      java.nio.file.Files.copy(src, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }

    val baseRun = CorpusPipeline.run(corpusDocs, heldOut,
      packBudget = 64, captureState = true)
    val baseRows = baseRun.corpus.count()

    // ---- streamed path: one file per trigger through foreachBatch
    val schema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
    val h = StreamingIngest.start(stream, baseRun.state.get,
      stateRoot = s"$work/state", checkpoint = s"$work/ckpt")
    h.query.processAllAvailable()
    h.query.stop()

    // ---- batch chain over the SAME staged files (identical inputs)
    var st = baseRun.state.get
    (1 to 3).foreach { i =>
      val df = spark.read.parquet(staged.resolve(f"slice_$i%04d.parquet").toString)
      st = CorpusPipeline.runIncremental(df, st).state.get
    }

    assert(h.stats.size == 3, s"expected 3 non-empty batches, got ${h.stats}")
    assert(rowKey(h.state.corpus) == rowKey(st.corpus),
      "streamed corpus != batch-chained corpus")
    // the probes really fired across the stream boundary: exact dups,
    // near-dups and the contaminated doc dropped; the unique docs landed
    val ids = h.state.corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    (1 to 3).foreach { i =>
      assert(ids.contains(i * 100L + 1L), s"slice $i unique doc missing")
      assert(!ids.contains(i * 100L + 2L), s"slice $i exact dup survived")
      assert(!ids.contains(i * 100L + 3L), s"slice $i near dup survived")
    }
    assert(!ids.contains(204L), "contaminated slice doc survived the stored bloom")
    assert(h.state.corpus.count() > baseRows, "nothing appended")

    // rotation: only the LAST batch's state directory remains
    val stateDirs = java.nio.file.Files.list(java.nio.file.Paths.get(s"$work/state"))
      .iterator()
    var remaining = List.empty[String]
    while (stateDirs.hasNext) remaining ::= stateDirs.next().getFileName.toString
    assert(remaining == List("state_2"),
      s"expected only the final state dir after rotation, got $remaining")
    assert(h.stateDir.exists(_.endsWith("state_2")))
  }

  test("embeddingsOf projector: the semantic probe fires across the stream boundary") {
    // docs stream WITH an embedding column; the projector peels it off
    // per batch so runIncremental's semantic probe runs against the
    // corpus's stored centroids — the slice near-duplicate of a corpus
    // vector (same direction, closer to the centroid) must drop, the
    // orthogonal one must survive
    val work = java.nio.file.Files.createTempDirectory("streaming-emb").toString
    val staged = java.nio.file.Paths.get(work, "slices")
    java.nio.file.Files.createDirectories(staged)

    def vec(parts: (Int, Double)*): Seq[Double] = {
      val a = Array.fill(8)(0.0)
      parts.foreach { case (i, v) => a(i) = v }
      a.toSeq
    }
    // corpus: 4 docs, one embedding cluster per k-means seed direction;
    // doc 3 sits FAR from centroid 0 (the stored anti-memorization keep)
    val corpusE = Seq(
      (1L, "en", "alpha beta gamma delta epsilon zeta", vec(0 -> 1.0)),
      (2L, "en", "one two three four five six seven", vec(1 -> 1.0)),
      (3L, "en", "red orange yellow green blue indigo", vec(0 -> 1.6)),
      (4L, "en", "north south east west up down sideways", vec(2 -> 1.0)))
    val baseRun = CorpusPipeline.run(
      corpusE.map(t => (t._1, t._2, t._3)).toDF("doc_id", "lang", "text"),
      heldOut,
      embeddings = Some(corpusE.map(t => (t._1, t._4)).toDF("doc_id", "embedding")),
      semK = 3, semIters = 2, semThreshold = 0.9, semMaxCell = 8,
      packBudget = 64, captureState = true)

    // slice: 101 = same direction as the cell-0 cluster, closer to the
    // centroid than stored member 3 (dropped by the probe); 102 = a
    // fresh orthogonal direction (survives)
    val slice = Seq(
      (101L, "en", "aa bb cc dd ee ff gg hh", vec(0 -> 1.1)),
      (102L, "en", "ii jj kk ll mm nn oo pp", vec(3 -> 1.0)))
      .toDF("doc_id", "lang", "text", "emb")
    slice.coalesce(1).write.parquet(java.nio.file.Paths.get(work, "tmp").toString)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(work, "tmp")).iterator()
    var src: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) src = p
    }
    java.nio.file.Files.copy(src, staged.resolve("slice_0001.parquet"))

    val schema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(schema).parquet(staged.toString)
    val h = StreamingIngest.start(stream, baseRun.state.get,
      stateRoot = s"$work/state", checkpoint = s"$work/ckpt",
      embeddingsOf = Some(b =>
        b.select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("emb").as("embedding"))))
    h.query.processAllAvailable()
    h.query.stop()

    val ids = h.state.corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(101L), "semantic near-dup of a stored member must drop")
    assert(ids.contains(102L), "orthogonal slice doc must survive the probe")
  }

  test("an already-committed batch replays idempotently: load, never recompute") {
    // foreachBatch is at-least-once: a crash between the state commit
    // and the checkpoint's offset commit replays the batch. The state
    // dir is keyed by batchId, so the replay must SHORT-CIRCUIT to
    // loading the committed state — recomputing would double-append
    // against the rolled state and trip the append-only require.
    // Simulated directly: pre-commit a state under this stream's
    // batch-0 key whose corpus is DISTINGUISHABLE from what recomputing
    // the batch would produce, then run the stream — the handle must
    // come back with the pre-committed state, and the slice docs must
    // NOT be appended a second time.
    val work = java.nio.file.Files.createTempDirectory("streaming-replay").toString
    val staged = java.nio.file.Paths.get(work, "slices")
    java.nio.file.Files.createDirectories(staged)
    sliceDocs(1).coalesce(1).write.parquet(java.nio.file.Paths.get(work, "tmp").toString)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(work, "tmp"))
      .iterator()
    var src: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) src = p
    }
    java.nio.file.Files.copy(src, staged.resolve("slice_0001.parquet"))

    val baseRun = CorpusPipeline.run(corpusDocs, heldOut,
      packBudget = 64, captureState = true)
    // "yesterday's crash already committed batch 0": a rolled state
    // whose corpus carries a sentinel doc id no recompute would produce
    val sentinel = CorpusPipeline.runIncremental(
      Seq((5000L, "en", (0 until 8).map(w => s"sentinelword$w").mkString(" ")))
        .toDF("doc_id", "lang", "text"),
      baseRun.state.get).state.get
    CorpusPipeline.CorpusState.write(sentinel, s"$work/state/state_0")

    val schema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
    val h = StreamingIngest.start(stream, baseRun.state.get,
      stateRoot = s"$work/state", checkpoint = s"$work/ckpt")
    h.query.processAllAvailable()
    h.query.stop()

    val ids = h.state.corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(5000L), "replay must LOAD the committed state (sentinel doc)")
    assert(!ids.contains(101L), "replay must not recompute and double-append the slice")
    assert(h.stats.map(_.sliceRows) == Seq(0L), s"replay stats must mark 0 computed rows: ${h.stats}")
  }
}
