package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Round-15 gate for the daily mode's load-bearing scale claim: with
  * CorpusState persisted via [[CorpusPipeline.CorpusState.writeBucketed]]
  * (probe-index tables `bucketBy` their join keys), every incremental
  * probe join must plan with NO Exchange on the index side — the index
  * scan arrives pre-partitioned by the join key, so a slice costs one
  * shuffle of the SLICE only, never a re-shuffle of the corpus-sized
  * index. At 100 TB the index side is the corpus; re-shuffling it per
  * slice is the difference between O(slice) and O(corpus) daily cost.
  *
  * Round-16 (verdict #1): the gate runs in the FRESH-APPLICATION shape —
  * after writeBucketed, every catalog entry is DROPPED (tomorrow's daily
  * job starts with an empty metastore) and [[CorpusPipeline.CorpusState
  * .loadBucketed]] must re-register the tables from the directory alone
  * (bucket count persisted in the meta row) and still pass the
  * no-Exchange gate. A STALE catalog entry (same name, wrong location —
  * a test rerun, a retired state dir reusing the prefix) must be
  * detected and replaced, never trusted. The member table of the
  * semantic state (sem_cell_members, bucketed by cid — the one semantic
  * piece that grows with k·maxCell) is gated alongside the three
  * probe-index tables.
  *
  * The gate reads the actual physical plans (AQE and auto-broadcast off,
  * so the shuffle-join shape is what a corpus-sized index would get): for
  * every equi-join whose one side subtree contains a BUCKETED file scan,
  * that subtree must contain no ShuffleExchangeExec. Equivalence is gated
  * too: the bucketed-loaded state drives an incremental run identical to
  * the plain-loaded state's.
  */
class CorpusStateBucketedSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while " +
    "seven wizards brew strong coffee at dawn near the old stone bridge"

  private def docs = Seq(
    (1L, "en", base),
    (2L, "en", "completely different content about distributed query engines " +
      "processing immense volumes of training data every single day"),
    (3L, "en", "an entirely separate clean document describing benchmark " +
      "suites measuring shuffle throughput under concurrent analytical load")
  ).toDF("doc_id", "lang", "text")

  private def corpusEmb = Seq(
    (1L, Seq(1.0, 0.0, 0.0, 0.0)),
    (2L, Seq(0.0, 1.0, 0.0, 0.0)),
    (3L, Seq(0.0, 0.0, 1.0, 0.0))
  ).toDF("doc_id", "embedding")

  private def heldOut = Seq((100L, "en", "held out evaluation passage that " +
    "must never leak into any training corpus")).toDF("doc_id", "lang", "text")

  private def slice = Seq(
    (20L, "en", base + " tomorrow"),
    (21L, "en", "a genuinely new slice document covering tidal energy " +
      "storage economics and grid balancing across northern regions")
  ).toDF("doc_id", "lang", "text")

  // dissimilar to every corpus vector: the semantic PROBE runs (the plan
  // gate's subject) without dropping the slice survivor
  private def sliceEmb = Seq(
    (20L, Seq(0.9, 0.1, 0.0, 0.0)),
    (21L, Seq(0.0, 0.0, 0.0, 1.0))
  ).toDF("doc_id", "embedding")

  /** All bucketed file scans in a plan subtree. */
  private def bucketedScans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case s: FileSourceScanExec if s.relation.bucketSpec.isDefined => s }

  private def isJoin(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
    case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
    case _ => false
  }

  /** Root-to-node path by reference identity. */
  private def pathTo(p: SparkPlan, target: SparkPlan): Option[List[SparkPlan]] =
    if (p eq target) Some(List(p))
    else p.children.view.flatMap(c => pathTo(c, target)).headOption.map(p :: _)

  /** Assert: every bucketed scan feeds its nearest JOIN ancestor with no
    * Exchange in between — the index arrives at the probe join
    * pre-partitioned. (Shuffles ABOVE the join move joined, slice-sized
    * data and are expected; a shuffle BETWEEN the join and the index scan
    * would mean the corpus-sized index re-shuffles per slice.) Returns
    * how many probe-side scans were checked. */
  private def assertNoIndexSideExchange(df: DataFrame, what: String): Int = {
    val plan = df.queryExecution.executedPlan
    val scans = bucketedScans(plan)
    assert(scans.nonEmpty,
      s"$what: expected a bucketed index scan in the plan " +
        s"(did the bucketed table load degrade to a plain scan?)\n$plan")
    scans.foreach { scan =>
      val path = pathTo(plan, scan).getOrElse(
        fail(s"$what: could not locate the bucketed scan in its own plan"))
      val joinIdx = path.lastIndexWhere(isJoin)
      assert(joinIdx >= 0,
        s"$what: bucketed scan has no join ancestor — probe shape changed?\n$plan")
      val betweenJoinAndScan = path.drop(joinIdx + 1)
      val exchanges = betweenJoinAndScan.filter(_.isInstanceOf[ShuffleExchangeExec])
      assert(exchanges.isEmpty,
        s"$what: Exchange BETWEEN the probe join and the bucketed index scan — " +
          s"the co-location claim is broken (the corpus-sized index would " +
          s"re-shuffle per slice):\n${path(joinIdx)}")
    }
    scans.size
  }

  private def withShuffleJoins[T](body: => T): T = {
    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled", "true")
    val oldBc = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
  }

  /** The four probe-plan gates, exactly as runIncremental builds them. */
  private def assertAllProbesColocated(
      loaded: CorpusPipeline.CorpusState): Unit = withShuffleJoins {
    val p1 = CorpusPipeline.exactProbe(slice, loaded)
    assertNoIndexSideExchange(p1, "exactProbe(content_hashes)")

    val bands = CorpusPipeline.bandsOf(slice)
    val p2 = CorpusPipeline.bandProbe(bands, loaded)
    assertNoIndexSideExchange(p2, "bandProbe(band_index)")

    val p3 = graft.operators.ExactSubstr.scrubAgainst(
      slice, loaded.windowIndex, loaded.exactSubstrWindow)
    assertNoIndexSideExchange(p3, "scrubAgainst(window_index)")

    val p4 = graft.operators.SemDeDup.probeDrops(
      sliceEmb.select(col("doc_id").as("vec_id"), col("embedding")),
      loaded.semCentroids, loaded.semCellMembers,
      loaded.semThreshold, loaded.semMaxCell)
    assertNoIndexSideExchange(p4, "probeDrops(sem_cell_members)")
  }

  private def dropCatalogEntries(prefix: String): Unit =
    CorpusPipeline.CorpusState.BucketedTables.foreach { case (name, _) =>
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$name")
    }

  test("bucketed state survives a fresh application: catalog entries dropped, " +
      "loadBucketed re-registers from the directory, every probe (incl. the " +
      "semantic member table) joins with no index-side Exchange, and the run " +
      "equals the plain-parquet state's") {
    val b = CorpusPipeline.run(docs, heldOut, embeddings = Some(corpusEmb),
      exactSubstrWindow = 8, packBudget = 64, semK = 2, semIters = 1,
      captureState = true)
    assert(!b.state.get.semCellMembers.isEmpty, "fixture must carry semantic state")
    val dir = java.nio.file.Files.createTempDirectory("state_bucketed").toString
    val prefix = "graft_test_corpus_state"
    try {
      CorpusPipeline.CorpusState.writeBucketed(b.state.get, dir, prefix, buckets = 4)

      // same-session shape (the round-15 gate) still holds
      assertAllProbesColocated(
        CorpusPipeline.CorpusState.loadBucketed(spark, dir, prefix))

      // FRESH APPLICATION: tomorrow's job has an empty metastore — drop
      // every catalog entry, then loadBucketed must re-register from the
      // directory (bucket count from meta) and re-pass the plan gate
      dropCatalogEntries(prefix)
      CorpusPipeline.CorpusState.BucketedTables.foreach { case (name, _) =>
        assert(!spark.catalog.tableExists(s"${prefix}_$name"))
      }
      val loaded = CorpusPipeline.CorpusState.loadBucketed(spark, dir, prefix)
      assertAllProbesColocated(loaded)

      // STALE catalog entry: same name, wrong location/spec (a retired
      // state dir reusing the prefix) — must be replaced, never trusted
      spark.sql(s"DROP TABLE ${prefix}_content_hashes")
      val decoy = java.nio.file.Files.createTempDirectory("state_decoy").toString
      Seq("deadbeef").toDF("content_hash").write.parquet(s"$decoy/content_hashes")
      spark.sql(
        s"CREATE TABLE ${prefix}_content_hashes (content_hash STRING) " +
          s"USING parquet LOCATION '$decoy/content_hashes'")
      val reloaded = CorpusPipeline.CorpusState.loadBucketed(spark, dir, prefix)
      assertAllProbesColocated(reloaded)
      assert(reloaded.contentHashes.count() == b.state.get.contentHashes.count(),
        "stale catalog entry was trusted — loadBucketed read the decoy table")

      // semantics unchanged by the layout: bucketed-loaded ≡ plain-loaded
      val plain = CorpusPipeline.CorpusState.load(spark, dir)
      val viaBucketed = CorpusPipeline.runIncremental(slice, reloaded,
        packBudget = 64, embeddings = Some(sliceEmb))
      val viaPlain = CorpusPipeline.runIncremental(slice, plain,
        packBudget = 64, embeddings = Some(sliceEmb))
      assert(viaBucketed.manifest == viaPlain.manifest)
      assert(viaBucketed.corpus.collect().map(_.toString).sorted.toSeq ==
        viaPlain.corpus.collect().map(_.toString).sorted.toSeq)
      // and the slice survivor actually made it in
      val ids = viaBucketed.corpus.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids.contains(21L) && !ids.contains(20L), ids.toString)
    } finally {
      dropCatalogEntries(prefix)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("writeBucketed refuses a tablePrefix the state itself still reads " +
      "through the catalog (the day-2 same-prefix overwrite hazard)") {
    val b = CorpusPipeline.run(docs, heldOut, embeddings = Some(corpusEmb),
      exactSubstrWindow = 8, packBudget = 64, semK = 2, semIters = 1,
      captureState = true)
    val dir = java.nio.file.Files.createTempDirectory("state_prefix_guard").toString
    val prefix = "graft_test_prefix_guard"
    try {
      CorpusPipeline.CorpusState.writeBucketed(b.state.get, dir, prefix, buckets = 4)
      dropCatalogEntries(prefix)
      val loaded = CorpusPipeline.CorpusState.loadBucketed(spark, dir, prefix)
      val rolled = CorpusPipeline.runIncremental(slice, loaded,
        packBudget = 64, embeddings = Some(sliceEmb)).state.get
      val dir2 = java.nio.file.Files.createTempDirectory("state_prefix_guard2").toString
      // fresh DIRECTORY (file-path guard passes) but the SAME prefix: the
      // rolled state still reads prefix_* catalog tables — must refuse
      val e = intercept[IllegalArgumentException](
        CorpusPipeline.CorpusState.writeBucketed(rolled, dir2, prefix, buckets = 4))
      assert(e.getMessage.contains(prefix), e.getMessage)
      // a fresh prefix (the daily rotation) is accepted
      CorpusPipeline.CorpusState.writeBucketed(rolled, dir2, s"${prefix}_day2",
        buckets = 4)
    } finally {
      dropCatalogEntries(prefix)
      dropCatalogEntries(s"${prefix}_day2")
    }
  }
}
