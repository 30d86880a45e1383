package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *   runMain graft.CorpusBench incremental <corpusSfDir> <sliceSfDir> [plain|bucketed]
  *     — build the corpus WITH state capture from corpusSfDir, then
  *       ingest sliceSfDir's documents (and embeddings — the semantic
  *       probe runs) as an id-shifted new slice via runIncremental;
  *       prints base_wall vs incremental_wall — the daily-operating-mode
  *       evidence that a slice costs O(slice), not O(corpus+slice).
  *       With a layout arg the state goes through the DEPLOYMENT shape:
  *       persisted to disk and RELOADED before the slice runs ("plain" =
  *       parquet, "bucketed" = probe indexes as bucketBy tables), and the
  *       record carries the probe-plan audit: exchanges between each
  *       probe join and its index scan under forced shuffle joins —
  *       0 everywhere for "bucketed" (the co-located-probe claim,
  *       asserted, not just printed), 1 per probe for "plain".
  *   runMain graft.CorpusBench chain <corpusSfDir> <sliceSfDir> <nSlices>
  *     — the endurance leg (round-14 verdict #6): n consecutive slices
  *       roll the state forward (each slice gets a fresh id range AND a
  *       slice-specific vocabulary so survivors flow every day), with one
  *       parquet round-trip mid-chain, per-slice walls recorded, and the
  *       final corpus GATED equal to a full rebuild of corpus ∪ all
  *       slices under the pinned base tokenizer (multiset of
  *       doc_id/lang/n_tokens/shard via exact xxhash64-sum compare; the
  *       job aborts on mismatch).
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
    if (args.headOption.contains("incremental"))
      incremental(args(1), args(2), args.drop(3).headOption.getOrElse("memory"))
    else if (args.headOption.contains("chain"))
      chain(args(1), args(2), args.drop(3).headOption.map(_.toInt).getOrElse(5))
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

  /** Exchanges BETWEEN each incremental probe join and its index-side
    * scan, under forced shuffle joins (broadcast + AQE off, so the plan
    * is the one a corpus-sized index gets): 0 = the index arrives
    * pre-partitioned (bucketed co-location), 1 = the index re-shuffles
    * per slice (plain parquet). Identification is by scan location under
    * `stateDir` — works for plain AND bucketed layouts. */
  private def probeIndexExchanges(
      spark: SparkSession,
      slice: DataFrame,
      state: graft.corpus.CorpusPipeline.CorpusState,
      stateDir: String): Map[String, Int] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def isJoin(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case _ => false
    }
    def pathTo(p: SparkPlan, target: SparkPlan): Option[List[SparkPlan]] =
      if (p eq target) Some(List(p))
      else p.children.view.flatMap(c => pathTo(c, target)).headOption.map(p :: _)
    def exchangesToIndexScan(df: DataFrame, table: String): Int = {
      val plan = df.queryExecution.executedPlan
      val scans = plan.collect {
        case s: FileSourceScanExec if s.relation.location.rootPaths.exists(
          p => p.toString.contains(stateDir) && p.toString.contains(table)) => s
      }
      require(scans.nonEmpty, s"probe audit: no $table scan under $stateDir in\n$plan")
      scans.map { scan =>
        val path = pathTo(plan, scan).get
        val joinIdx = path.lastIndexWhere(isJoin)
        require(joinIdx >= 0, s"probe audit: $table scan has no join ancestor")
        path.drop(joinIdx + 1).count(_.isInstanceOf[ShuffleExchangeExec])
      }.max
    }
    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled", "true")
    val oldBc = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cp = graft.corpus.CorpusPipeline
      Map(
        "content_hashes" -> exchangesToIndexScan(cp.exactProbe(slice, state), "content_hashes"),
        "band_index" -> exchangesToIndexScan(cp.bandProbe(cp.bandsOf(slice), state), "band_index"),
        "window_index" -> exchangesToIndexScan(
          graft.operators.ExactSubstr.scrubAgainst(
            slice, state.windowIndex, state.exactSubstrWindow), "window_index"))
    } finally {
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
  }

  private def incremental(corpusSf: String, sliceSf: String, layout: String): Unit = {
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

    // deployment shape when a layout is named: persist the state and
    // RELOAD it — the slice job reads yesterday's tables, not this JVM's
    // cached frames
    val stateDir = java.nio.file.Files.createTempDirectory("corpus_state_bench").toString
    val prefix = "graft_bench_corpus_state"
    val cs = graft.corpus.CorpusPipeline.CorpusState
    val state = layout match {
      case "bucketed" =>
        cs.writeBucketed(base.state.get, stateDir, prefix)
        cs.loadBucketed(spark, stateDir, prefix)
      case "plain" =>
        cs.write(base.state.get, stateDir)
        cs.load(spark, stateDir)
      case _ => base.state.get
    }

    // the slice: the smaller fixture's docs, id-shifted above the corpus
    // high-water mark (the append-only contract a real crawl slice gets
    // from its ingestion sequence numbers); embeddings shift with it so
    // the semantic probe runs
    val offset = state.maxDocId + 1L
    val slice = docsOf(spark, sliceSf)
      .withColumn("doc_id", col("doc_id") + lit(offset))
    val sliceEmb = graft.io.Tables.embeddings(spark, sliceSf)
      .select((col("vec_id") + lit(offset)).as("doc_id"), col("embedding"))

    // probe-plan audit (persisted layouts only): the bucketed claim is
    // ASSERTED — an exchange on the index side aborts the leg
    val exchanges =
      if (layout == "bucketed" || layout == "plain")
        Some(probeIndexExchanges(spark, slice, state, stateDir))
      else None
    exchanges.foreach { ex =>
      if (layout == "bucketed") require(ex.values.forall(_ == 0),
        s"bucketed state: expected 0 index-side exchanges, got $ex")
    }

    val t1 = System.nanoTime()
    val inc = graft.corpus.CorpusPipeline.runIncremental(slice, state,
      embeddings = Some(sliceEmb))
    val incRows = inc.corpus.count()
    val incWall = (System.nanoTime() - t1) / 1e9
    val exchangesJson = exchanges.map(ex =>
      ex.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
        .mkString(""","index_side_exchanges":{""", ",", "}")).getOrElse("")
    println(
      s"""{"metric":"corpus_incremental","base_wall_sec":${math.round(baseWall * 10) / 10.0},""" +
        s""""incremental_wall_sec":${math.round(incWall * 10) / 10.0},""" +
        s""""corpus_sf":"$corpusSf","slice_sf":"$sliceSf","state_layout":"$layout"$exchangesJson,""" +
        s""""base_stages":${stagesJson(base.manifest)},""" +
        s""""slice_stages":${stagesJson(inc.manifest)},""" +
        s""""base_corpus_rows":$baseRows,"appended_corpus_rows":$incRows}""")
    spark.stop()
  }

  /** Exact multiset fingerprint of the corpus-defining columns: count +
    * xxhash64 summed exactly (decimal(38,0) — no overflow, no float). */
  private def corpusFingerprint(df: DataFrame): (Long, java.math.BigDecimal) = {
    val row = df.select(
        xxhash64(col("doc_id"), col("lang"), col("n_tokens"), col("shard")).as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h").cast("decimal(38,0)")).as("s"))
      .head
    (row.getLong(0), if (row.isNullAt(1)) java.math.BigDecimal.ZERO else row.getDecimal(1))
  }

  private def chain(corpusSf: String, sliceSf: String, nSlices: Int): Unit = {
    val spark = session()
    val docs = docsOf(spark, corpusSf)
    val heldOut = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)

    val t0 = System.nanoTime()
    val base = graft.corpus.CorpusPipeline.run(
      corpus, heldOut, tokenizer = "bpe", decontamShingle = 8,
      captureState = true)
    val baseWall = (System.nanoTime() - t0) / 1e9

    // each day's slice: the slice fixture re-vocabularied per slice
    // (prefix every word with the slice tag) so consecutive days carry
    // genuinely NEW documents — the fixture replayed verbatim would
    // exact-dedup to nothing after day 1 — and id-shifted above the
    // rolling high-water mark
    def sliceFor(i: Int, offset: Long): DataFrame =
      docsOf(spark, sliceSf)
        .withColumn("doc_id", col("doc_id") + lit(offset))
        .withColumn("text",
          array_join(transform(split(col("text"), " "),
            w => concat(lit(s"s${i}x"), w)), " "))

    var state = base.state.get
    val walls = Seq.newBuilder[Double]
    val survivors = Seq.newBuilder[Long]
    val roundTripAt = math.max(1, nSlices / 2)
    var slices = Seq.empty[DataFrame]
    (1 to nSlices).foreach { i =>
      val slice = sliceFor(i, state.maxDocId + 1L)
      slices = slices :+ slice
      val t = System.nanoTime()
      val r = graft.corpus.CorpusPipeline.runIncremental(slice, state)
      val packed = r.manifest.find(_.stage == "packed_sharded").map(_.rows).getOrElse(0L)
      walls += (System.nanoTime() - t) / 1e9
      survivors += packed
      state = r.state.get
      if (i == roundTripAt) {
        // mid-chain parquet round-trip: the rest of the chain runs off
        // yesterday's persisted tables, the actual daily deployment shape
        val dir = java.nio.file.Files.createTempDirectory(s"chain_state_$i").toString
        graft.corpus.CorpusPipeline.CorpusState.write(state, dir)
        state = graft.corpus.CorpusPipeline.CorpusState.load(spark, dir)
      }
    }

    // the endurance gate: final chained corpus ≡ one full rebuild of
    // corpus ∪ every slice under the PINNED base tokenizer
    val t2 = System.nanoTime()
    val rebuilt = graft.corpus.CorpusPipeline.run(
      slices.foldLeft(corpus)(_ unionByName _), heldOut, tokenizer = "bpe",
      decontamShingle = 8,
      pinnedTokenizer = Some((base.merges, base.unigramVocab)))
    val (rn, rs) = corpusFingerprint(rebuilt.corpus)
    val rebuildWall = (System.nanoTime() - t2) / 1e9
    val (cn, csum) = corpusFingerprint(state.corpus)
    val equal = rn == cn && rs.compareTo(csum) == 0
    val wallsJson = walls.result().map(w => math.round(w * 10) / 10.0)
      .mkString("[", ",", "]")
    val survJson = survivors.result().mkString("[", ",", "]")
    println(
      s"""{"metric":"corpus_chain","n_slices":$nSlices,""" +
        s""""corpus_sf":"$corpusSf","slice_sf":"$sliceSf",""" +
        s""""base_wall_sec":${math.round(baseWall * 10) / 10.0},""" +
        s""""slice_walls_sec":$wallsJson,"slice_survivors":$survJson,""" +
        s""""round_trip_after_slice":$roundTripAt,""" +
        s""""rebuild_wall_sec":${math.round(rebuildWall * 10) / 10.0},""" +
        s""""final_rows":$cn,"final_equals_rebuild":$equal}""")
    require(equal,
      s"chain final corpus != full rebuild: chained ($cn, $csum) vs rebuilt ($rn, $rs)")
    spark.stop()
  }
}
