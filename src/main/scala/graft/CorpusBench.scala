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
  * Usage: runMain graft.CorpusBench [sfDir] [bpe|unigram]
  */
object CorpusBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tokenizer = args.drop(1).headOption.getOrElse("bpe")
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

    // repartition: the fixture parquet is one row group → one task; the
    // pipeline's per-doc CPU (md5 shingles, rolling windows) wants cores
    val docs = graft.io.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .repartition(cpus.toInt * 2)
    // held-out evaluation set: every 97th doc, EXCLUDED from the corpus
    // (decontamination then has real work: near-copies of held-out docs
    // exist in the fixture's duplicate pairs)
    val heldOut = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val emb = graft.io.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"), col("embedding"))

    val t0 = System.nanoTime()
    // decontamShingle = 8: the long-n-gram production posture (see the
    // pipeline's stage-4 comment) — a 3-gram any-match rule on this
    // templated synthetic corpus flags ~94 % of documents
    val r = graft.corpus.CorpusPipeline.run(
      corpus, heldOut, embeddings = Some(emb), tokenizer = tokenizer,
      decontamShingle = 8)
    val outRows = r.corpus.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val stages = r.manifest.map(m => s""""${m.stage}":${m.rows}""").mkString("{", ",", "}")
    println(
      s"""{"metric":"corpus_pipeline","value":${math.round(wall * 10) / 10.0},""" +
        s""""unit":"sec","tokenizer":"$tokenizer","sf":"$sfDir",""" +
        s""""stages":$stages,"corpus_rows":$outRows,""" +
        s""""bpe_merges":${r.merges.size},"unigram_vocab":${r.unigramVocab.size}}""")
    spark.stop()
  }
}
