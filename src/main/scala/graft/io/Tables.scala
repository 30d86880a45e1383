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
      // The driver has shipped events.ts under two parquet encodings:
      // TIMESTAMP(NANOS, isAdjustedToUTC=false) — which Spark 4 refuses by
      // default — and plain timestamp[us]. The fixtures are regenerated
      // outside our control, so branch on the schema the file actually
      // declares instead of assuming either encoding.
      //
      // The nanosAsLong conf is the only way to open NANOS parquet (no
      // per-read option exists); it only changes how NANOS columns are typed,
      // so setting it unconditionally is harmless for µs fixtures, and it
      // must be set before the read plans its schema. Under it a NANOS column
      // arrives as LongType → integer-divide raw nanos to a µs TIMESTAMP_NTZ,
      // epoch-anchored so the NTZ value is independent of
      // spark.sql.session.timeZone. A µs column already arrives as a
      // timestamp type (NTZ for isAdjustedToUTC=false) → pass through.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.expr(
              "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
        case _ => df
      }
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
