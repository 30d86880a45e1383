package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name, reps) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.{col, struct, sum, xxhash64, count}
    (1 to reps.toInt).foreach { i =>
      val t0 = System.nanoTime()
      // force evaluation of every output column (count() alone would let
      // Catalyst prune all projection work) — same harness as graft.Bench
      val n = SparkEntry.queries(name)(spark, sfDir)
        .select(xxhash64(struct(col("*"))).cast("double").as("_h"))
        .agg(sum(col("_h")), count(col("_h"))).head.getLong(1)
      println(f"rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    spark.stop()
  }
}
