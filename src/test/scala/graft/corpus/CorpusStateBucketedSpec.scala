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

  private def heldOut = Seq((100L, "en", "held out evaluation passage that " +
    "must never leak into any training corpus")).toDF("doc_id", "lang", "text")

  private def slice = Seq(
    (20L, "en", base + " tomorrow"),
    (21L, "en", "a genuinely new slice document covering tidal energy " +
      "storage economics and grid balancing across northern regions")
  ).toDF("doc_id", "lang", "text")

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

  test("bucketed state: every incremental probe joins with no Exchange on the index side, " +
      "and drives a run identical to the plain-parquet state") {
    val b = CorpusPipeline.run(docs, heldOut,
      exactSubstrWindow = 8, packBudget = 64, captureState = true)
    val dir = java.nio.file.Files.createTempDirectory("state_bucketed").toString
    val prefix = "graft_test_corpus_state"
    try {
      CorpusPipeline.CorpusState.writeBucketed(b.state.get, dir, prefix, buckets = 4)
      val loaded = CorpusPipeline.CorpusState.loadBucketed(spark, dir, prefix)

      // the three probe joins, exactly as runIncremental builds them
      withShuffleJoins {
        val intraCanon = slice // content-hash canonicalization is slice-side only
        val p1 = CorpusPipeline.exactProbe(intraCanon, loaded)
        assertNoIndexSideExchange(p1, "exactProbe(content_hashes)")

        val bands = CorpusPipeline.bandsOf(slice)
        val p2 = CorpusPipeline.bandProbe(bands, loaded)
        assertNoIndexSideExchange(p2, "bandProbe(band_index)")

        val p3 = graft.operators.ExactSubstr.scrubAgainst(
          slice, loaded.windowIndex, loaded.exactSubstrWindow)
        assertNoIndexSideExchange(p3, "scrubAgainst(window_index)")
      }

      // semantics unchanged by the layout: bucketed-loaded ≡ plain-loaded
      val plain = CorpusPipeline.CorpusState.load(spark, dir)
      val viaBucketed = CorpusPipeline.runIncremental(slice, loaded, packBudget = 64)
      val viaPlain = CorpusPipeline.runIncremental(slice, plain, packBudget = 64)
      assert(viaBucketed.manifest == viaPlain.manifest)
      assert(viaBucketed.corpus.collect().map(_.toString).sorted.toSeq ==
        viaPlain.corpus.collect().map(_.toString).sorted.toSeq)
      // and the slice survivor actually made it in
      val ids = viaBucketed.corpus.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids.contains(21L) && !ids.contains(20L), ids.toString)
    } finally {
      CorpusPipeline.CorpusState.BucketedTables.foreach { case (name, _) =>
        spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$name")
      }
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }
}
