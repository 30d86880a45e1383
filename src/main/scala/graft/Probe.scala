package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, struct, sum, xxhash64}

/** Memory-headroom probe (round-12 verdict #4): run a handful of the
  * HEAVIEST catalog entries at scales ABOVE the sweep's top (sf4–5,
  * 40–50× the committed fixture) and report, per query, what the sweep's
  * pass/fail gate cannot see — spill volumes, peak execution memory, and
  * peak JVM heap — so BENCH.md's scale section can state memory behavior
  * from measurement instead of extrapolation.
  *
  * One JSON line per query:
  *   {"query":…,"wall_sec":…,"mem_spill_mb":…,"disk_spill_mb":…,
  *    "peak_exec_mem_mb":…,"peak_heap_mb":…,"rows":…}
  * `mem/disk_spill` aggregate Spark's task metrics for the query's stages
  * (sequential execution + a listener-bus drain between queries make the
  * attribution exact); `peak_exec_mem_mb` is the max single-task unsafe
  * memory reservation — the number that predicts an executor OOM;
  * `peak_heap_mb` is sampled driver+executor heap (one JVM in local mode).
  *
  * Usage: runMain graft.Probe <sfDir> [name1,name2,…]
  * Default query set: the bench suite's historical heavy tail.
  */
object Probe {

  private val DefaultHeavy = Seq(
    "d14_exact_substring_dedup", "d15_semdedup_cells", "d16_semdedup_centroid_keep",
    "g1_pagerank", "g2_hits", "g4_label_propagation",
    "g6_triangle_count", "x10_cluster_shard", "t16_ccnet_buckets",
    "dq3_column_profile", "t10_tfidf_keywords", "b1_bloom_decontamination")

  private final class SpillListener extends org.apache.spark.scheduler.SparkListener {
    val memSpill = new AtomicLong; val diskSpill = new AtomicLong
    val peakExec = new AtomicLong
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        peakExec.updateAndGet(p => math.max(p, m.peakExecutionMemory))
      }
    }
    def reset(): Unit = { memSpill.set(0); diskSpill.set(0); peakExec.set(0) }
  }

  private def drain(sc: org.apache.spark.SparkContext): Unit =
    try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      val m = bus.getClass.getMethods.filter(_.getName == "waitUntilEmpty")
        .minBy(_.getParameterCount)
      if (m.getParameterCount == 0) m.invoke(bus)
      else m.invoke(bus, java.lang.Long.valueOf(30000L))
    } catch { case _: Throwable => Thread.sleep(2000) }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf4.0")
    val names = args.drop(1).headOption.map(_.split(",").toSeq).getOrElse(DefaultHeavy)
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
    val l = new SpillListener
    spark.sparkContext.addSparkListener(l)

    // peak-heap sampler: one daemon thread, 100 ms cadence, max-holding
    val peakHeap = new AtomicLong
    val sampler = new Thread(() => {
      val rt = Runtime.getRuntime
      while (true) {
        peakHeap.updateAndGet(p => math.max(p, rt.totalMemory() - rt.freeMemory()))
        Thread.sleep(100)
      }
    }, "probe-heap-sampler")
    sampler.setDaemon(true); sampler.start()

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[probe] unknown query: $name")
        case Some(fn) =>
          drain(spark.sparkContext); l.reset(); peakHeap.set(0)
          val t0 = System.nanoTime()
          val res =
            try {
              val df = fn(spark, sfDir)
              val n = df.count()
              // force every output column, the Bench materialization
              df.select(xxhash64(struct(col("*"))).cast("double").as("_h"))
                .agg(sum(col("_h"))).head
              Right(n)
            } catch { case e: Throwable => Left(Option(e.getMessage).getOrElse("?").take(200)) }
          val wall = (System.nanoTime() - t0) / 1e9
          drain(spark.sparkContext)
          def mb(b: Long): Long = b / (1024 * 1024)
          res match {
            case Right(n) => println(
              s"""{"query":"$name","wall_sec":${math.round(wall * 10) / 10.0},""" +
                s""""mem_spill_mb":${mb(l.memSpill.get)},"disk_spill_mb":${mb(l.diskSpill.get)},""" +
                s""""peak_exec_mem_mb":${mb(l.peakExec.get)},"peak_heap_mb":${mb(peakHeap.get)},"rows":$n}""")
            case Left(err) => println(
              s"""{"query":"$name","wall_sec":${math.round(wall * 10) / 10.0},"error":"${err.replace("\"", "'")}"}""")
          }
      }
    }
    spark.stop()
  }
}
