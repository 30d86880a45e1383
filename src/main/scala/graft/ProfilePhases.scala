package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, struct, sum, xxhash64}

/** Optimization-round profiling aid: split each catalog query's wall into
  * driver-side plan phases (parsing/analysis/optimization/planning, from
  * Spark's own QueryPlanningTracker) vs execution, plus the job count (AQE
  * re-optimization rounds each submit their own job). The split decides
  * whether a slow entry needs a better PLAN (execution-bound) or is paying
  * driver constants (phase-bound) — guide §1 "decide whether the time is
  * going to ... executor compute, scheduler delay".
  *
  * Usage: runMain graft.ProfilePhases <sfDir> [name1,name2,...] [reps]
  * One JSON line per query: phases in ms, exec = wall - tracked phases.
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).headOption.filter(_.nonEmpty)
      .map(_.split(",").toSeq).getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(GraftSession.DefaultCheckpointDir)

    val jobCounter = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCounter.incrementAndGet()
    })

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[phases] unknown query: $name")
        case Some(fn) =>
          // rep 1 pays codegen/JIT; report the LAST rep
          var line = ""
          (1 to reps).foreach { _ =>
            jobCounter.set(0)
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            val tBuild = System.nanoTime()
            val out = df.select(xxhash64(struct(col("*"))).cast("double").as("_h"))
              .agg(sum(col("_h")))
            val qe = out.queryExecution
            qe.executedPlan // force analysis+optimization+planning
            val tPlan = System.nanoTime()
            out.head
            val tExec = System.nanoTime()
            val phases = qe.tracker.phases.map { case (p, s) =>
              p -> (s.endTimeMs - s.startTimeMs)
            }
            def ms(a: Long, b: Long): Long = (b - a) / 1000000
            line = s"""{"query":"$name","build_ms":${ms(t0, tBuild)},""" +
              s""""plan_ms":${ms(tBuild, tPlan)},"exec_ms":${ms(tPlan, tExec)},""" +
              s""""jobs":${jobCounter.get},""" +
              phases.toSeq.sortBy(_._1).map { case (p, d) => s""""$p":$d""" }
                .mkString("", ",", "}")
          }
          println(line)
      }
    }
    spark.stop()
  }
}
