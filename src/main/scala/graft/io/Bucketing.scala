package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins — the write-side half of the
  * shuffle-minimization story (SURVEY §4; README design notes): two tables
  * bucketed by the SAME key into the SAME bucket count join WITHOUT either
  * side shuffling, because rows with equal keys are already in matching
  * files. At 100 TB this converts every recurring fact⋈fact join on the
  * bucket key from a full exchange of both sides into a local zip of
  * bucket files — the single biggest recurring-shuffle saving a warehouse
  * layout can buy.
  *
  * Bucketed writes go through the session catalog (`saveAsTable`; plain
  * `parquet(path)` cannot record bucket metadata), so readers use
  * `spark.table(name)`. Sorting within buckets (`sortBy` on the join key)
  * additionally lets sort-merge joins skip their sort step.
  */
object Bucketing {

  /** Write `df` as a bucketed (and in-bucket sorted) managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    df.write
      .mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — plans with ZERO
    * exchanges when both were written by [[writeBucketed]] with equal
    * bucket counts (assert via `df.queryExecution.executedPlan`). */
  def cogroupJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
