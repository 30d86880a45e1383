package graft.finance

import org.apache.spark.sql.types._

/** Explicit StructTypes for every table in the finance warehouse.
  *
  * Mirrors the reference's physical DDL (`ui/backend/init_db.py`) and dbt
  * source contracts (`dbt/models/staging/sources.yml`): the raw layer is
  * loosely typed (dates/timestamps as TEXT, epochs as BIGINT) and the first
  * staging transform does all casting — see [[Staging]].
  *
  * Money is DecimalType(18,2), never Double: the reference declares NUMERIC
  * (`init_db.py:102`) and decimal sums are order-independent, which Spark's
  * parallel aggregation requires for deterministic results.
  */
object Schemas {

  /** Read a CSV seed under its declared schema (S4, the dbt-seed ingestion
    * path: `dbt_project.yml:6-16`): header row, explicit schema — never
    * inferSchema, which would scan twice and type-drift between runs.
    * FAILFAST: a malformed seed row is a config error to surface, not a
    * null to propagate silently into the mapping joins. */
  def readSeedCsv(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      schema: StructType): org.apache.spark.sql.DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(schema)
      .csv(path)

  /** Raw SimpleFIN extract — `public.simplefin` (`init_db.py:91-131`). */
  val simplefinRaw: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("account_id", StringType),
    StructField("account_name", StringType),
    StructField("institution_domain", StringType),
    StructField("institution_name", StringType),
    StructField("amount", DecimalType(18, 2)),
    StructField("posted", LongType),          // epoch seconds
    StructField("posted_date", StringType),   // TEXT in raw, cast in staging
    StructField("transacted_at", LongType),   // epoch seconds
    StructField("transacted_date", StringType),
    StructField("description", StringType),
    StructField("pending", BooleanType),
    StructField("extra", StringType),         // raw JSON spillover
    StructField("import_timestamp", StringType),
    StructField("import_date", StringType)))

  /** Historic-transactions CSV seed (`dbt/seeds/examples/historic_transactions_example.csv`). */
  val historicRaw: StructType = StructType(Seq(
    StructField("account_name", StringType),
    StructField("additional_account_detail", StringType),
    StructField("amount", StringType),            // kept as text: feeds the MD5 surrogate key
    StructField("transaction_date", StringType),
    StructField("description", StringType),
    StructField("source_category", StringType),
    StructField("master_category", StringType),
    StructField("input_date", StringType)))       // MM/DD/YYYY

  /** SimpleFIN account-mapping seed (`seed_account_mapping_simplefin.csv`). */
  val accountMappingSimplefin: StructType = StructType(Seq(
    StructField("account_name", StringType),
    StructField("account_id", StringType),
    StructField("mapped_account_name", StringType)))

  /** Historic account-mapping seed (`seed_account_mapping_historic.csv`). */
  val accountMappingHistoric: StructType = StructType(Seq(
    StructField("account_name", StringType),
    StructField("additional_account_info", StringType),
    StructField("mapped_account_name", StringType),
    StructField("owner_name", StringType)))

  /** ILIKE exclusion patterns seed (`seed_transaction_exclusions.csv`). */
  val transactionExclusions: StructType = StructType(Seq(
    StructField("pattern", StringType)))

  /** UI-written category overrides — `public.user_categories` (`init_db.py:134-161`). */
  val userCategories: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("master_category", StringType),
    StructField("source_category", StringType),
    StructField("notes", StringType),
    StructField("validated", BooleanType),
    StructField("exclude_from_forecast", BooleanType),
    StructField("updated_by", StringType),
    StructField("updated_at", TimestampType)))

  /** Classifier output — `analytics.predicted_transactions` (`init_db.py:30-88`). */
  val predictedTransactions: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("predicted_master_category", StringType),
    StructField("prediction_confidence", DecimalType(6, 4)),
    StructField("model_version", StringType),
    StructField("prediction_timestamp", TimestampType)))

  /** Model registry — `analytics.model_registry` (`init_db.py:195-251`).
    * JSONB metrics → a JSON string column, parsed on demand with from_json. */
  val modelRegistry: StructType = StructType(Seq(
    StructField("model_version", StringType),
    StructField("training_timestamp", TimestampType),
    StructField("file_path", StringType),
    StructField("metrics_json", StringType),
    StructField("status", StringType),        // trained | skipped | failed
    StructField("is_active", BooleanType),
    StructField("is_latest", BooleanType),
    StructField("accuracy", DoubleType),
    StructField("f1_macro", DoubleType),
    StructField("f1_weighted", DoubleType),
    StructField("precision_macro", DoubleType),
    StructField("recall_macro", DoubleType),
    StructField("n_train", LongType),
    StructField("n_test", LongType),
    StructField("n_classes", IntegerType),
    StructField("reason", StringType),
    StructField("message", StringType)))
}
