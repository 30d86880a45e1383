package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, struct, sum, xxhash64}

/** Benchmark main: one JSON line with per-query seconds at the target SF.
  *
  * Each query is first executed once against the sf0.001 fixture to pay
  * one-time costs that are data-independent — plan analysis, whole-stage
  * code generation, JIT — exactly once, outside the measured run (the
  * codegen cache keys on generated source, which is identical across scale
  * factors). The measured number is then the steady-state execution time at
  * the target scale, the quantity that actually extrapolates to a cluster.
  * Set SPARK_GRAFT_WARMUP=0 to measure cold instead.
  *
  * Materialization: a plain count() would let Catalyst prune every
  * projection expression (map-only queries would time a metadata-ish scan),
  * so the measured action hashes EVERY output column of every row into one
  * aggregated value — all computed work is forced, only 8 bytes cross to
  * the driver. A failed query reports -1 and logs to stderr rather than
  * recording a fast fake timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0" &&
      new java.io.File(warmDir).isDirectory
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(struct(col("*"))).cast("double").as("_h")) // double: ANSI long sum would overflow
        .agg(sum(col("_h"))).head

    // Fixed alphabetical order: per-query numbers stay comparable across
    // rounds (Map iteration order shifts whenever the catalog changes).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      if (warmup) {
        try materialize(fn(spark, warmDir)) catch { case _: Throwable => }
      }
      val t0 = System.nanoTime()
      val sec =
        try { materialize(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
