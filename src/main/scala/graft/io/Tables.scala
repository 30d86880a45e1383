package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated corpus (/root/repo/TESTDATA.md).
  *
  * Every table is a single parquet file under `sfDir`. Readers go through
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning; schemas are
  * whatever the files declare (the driver owns them, see TESTDATA.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table $name")
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS, isAdjustedToUTC=false), which
      // Spark 4 refuses by default. Values are µs-aligned (verified), so read
      // the raw int64 nanos and integer-divide to a µs TIMESTAMP_NTZ — NTZ to
      // match how Spark reads the other tables' isAdjustedToUTC=false columns
      // (and how DuckDB sees them: naive timestamps).
      //
      // The nanosAsLong conf is a deliberate session-level side effect: it is
      // the only way to open NANOS parquet (no per-read option exists), it
      // only affects how NANOS columns — absent from every other fixture —
      // are typed, and it must be set before THIS read plans its schema.
      // The epoch-anchored timestampadd keeps the NTZ value independent of
      // spark.sql.session.timeZone (timestamp_micros(...).cast("timestamp_ntz")
      // would shift values in a non-UTC session).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `documents` fanned out to one partition per core BEFORE the CPU-heavy
    * per-row stages (tokenize / shingle / hash). The fixtures are
    * single-row-group parquet, so the raw scan is ONE task no matter the
    * split config — without this, a 32-core run tokenizes on one core. The
    * exchanged payload is just the raw text (~MBs), trivially cheap next to
    * the 32× map parallelism it buys; on a many-file production corpus the
    * same repartition is how you decouple map parallelism from file layout. */
  def documentsFanned(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir).repartition(spark.sparkContext.defaultParallelism)

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
