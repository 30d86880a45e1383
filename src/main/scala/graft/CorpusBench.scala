package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end bench of the corpus capstone: run
  * [[graft.corpus.CorpusPipeline]] over the documents fixture (held-out
  * set = every 97th doc, removed from the input; embeddings joined where
  * the fixture has one for the doc id) and print ONE JSON line with the
  * wall and the per-stage manifest — the capstone's own evidence that the
  * composed chain (quality → exact dedup → near-dup → ExactSubstr →
  * SemDeDup → decontaminate → tokenize → pack → shard) runs at fixture
  * scale as one job graph, not just per-stage in specs.
  *
  * Modes:
  *   runMain graft.CorpusBench [sfDir] [bpe|unigram] [minimal|production]
  *     — full rebuild; `production` switches the stage-1 gate to the
  *       full Gopher+repetition+langid battery (per-rule drop counts land
  *       in the manifest), `minimal` (default) is the token-count core.
  *   runMain graft.CorpusBench incremental <corpusSfDir> <sliceSfDir>
  *     — build the corpus WITH state capture from corpusSfDir, then
  *       ingest sliceSfDir's documents as an id-shifted new slice via
  *       runIncremental; prints base_wall vs incremental_wall — the
  *       daily-operating-mode evidence that a slice costs O(slice), not
  *       O(corpus+slice).
  */
object CorpusBench {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(GraftSession.DefaultCheckpointDir)
    spark
  }

  private def cpusInt: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  /** Fixture docs, repartitioned for per-doc CPU (the fixture parquet is
    * one row group → one task otherwise). */
  private def docsOf(spark: SparkSession, sfDir: String) =
    graft.io.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .repartition(cpusInt * 2)

  private def stagesJson(ms: Seq[graft.corpus.CorpusPipeline.Manifest]): String =
    ms.map(m => s""""${m.stage}":${m.rows}""").mkString("{", ",", "}")

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("incremental")) incremental(args(1), args(2))
    else full(
      args.headOption.getOrElse("/root/testdata/sf0.1"),
      args.drop(1).headOption.getOrElse("bpe"),
      args.drop(2).headOption.getOrElse("minimal"))

  private def full(sfDir: String, tokenizer: String, preset: String): Unit = {
    val spark = session()
    val docs = docsOf(spark, sfDir)
    // held-out evaluation set: every 97th doc, EXCLUDED from the corpus
    // (decontamination then has real work: near-copies of held-out docs
    // exist in the fixture's duplicate pairs)
    val heldOut = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val emb = graft.io.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val quality = preset match {
      case "production" => graft.corpus.Quality.production()
      case _ => Seq.empty[graft.corpus.QualityRule]
    }

    val t0 = System.nanoTime()
    // decontamShingle = 8: the long-n-gram production posture (see the
    // pipeline's stage-4 comment) — a 3-gram any-match rule on this
    // templated synthetic corpus flags ~94 % of documents
    val r = graft.corpus.CorpusPipeline.run(
      corpus, heldOut, embeddings = Some(emb), tokenizer = tokenizer,
      decontamShingle = 8, quality = quality)
    val outRows = r.corpus.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(
      s"""{"metric":"corpus_pipeline","value":${math.round(wall * 10) / 10.0},""" +
        s""""unit":"sec","tokenizer":"$tokenizer","preset":"$preset","sf":"$sfDir",""" +
        s""""stages":${stagesJson(r.manifest)},"corpus_rows":$outRows,""" +
        s""""bpe_merges":${r.merges.size},"unigram_vocab":${r.unigramVocab.size}}""")
    spark.stop()
  }

  private def incremental(corpusSf: String, sliceSf: String): Unit = {
    val spark = session()
    val docs = docsOf(spark, corpusSf)
    val heldOut = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val emb = graft.io.Tables.embeddings(spark, corpusSf)
      .select(col("vec_id").as("doc_id"), col("embedding"))

    val t0 = System.nanoTime()
    val base = graft.corpus.CorpusPipeline.run(
      corpus, heldOut, embeddings = Some(emb), tokenizer = "bpe",
      decontamShingle = 8, captureState = true)
    val baseRows = base.corpus.count()
    val baseWall = (System.nanoTime() - t0) / 1e9
    val state = base.state.get

    // the slice: the smaller fixture's docs, id-shifted above the corpus
    // high-water mark (the append-only contract a real crawl slice gets
    // from its ingestion sequence numbers)
    val offset = state.maxDocId + 1L
    val slice = docsOf(spark, sliceSf)
      .withColumn("doc_id", col("doc_id") + lit(offset))

    val t1 = System.nanoTime()
    val inc = graft.corpus.CorpusPipeline.runIncremental(slice, state)
    val incRows = inc.corpus.count()
    val incWall = (System.nanoTime() - t1) / 1e9
    println(
      s"""{"metric":"corpus_incremental","base_wall_sec":${math.round(baseWall * 10) / 10.0},""" +
        s""""incremental_wall_sec":${math.round(incWall * 10) / 10.0},""" +
        s""""corpus_sf":"$corpusSf","slice_sf":"$sliceSf",""" +
        s""""base_stages":${stagesJson(base.manifest)},""" +
        s""""slice_stages":${stagesJson(inc.manifest)},""" +
        s""""base_corpus_rows":$baseRows,"appended_corpus_rows":$incRows}""")
    spark.stop()
  }
}
