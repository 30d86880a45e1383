package graft.finance

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, DoubleType}

/** On-demand JSON parsing for the two spillover columns (SURVEY §1.1/§2.9):
  * `model_registry.metrics` (JSONB in the reference, `init_db.py:204`, read
  * back via json.loads in `api/model_metrics.py:88-91`) and
  * `simplefin.extra` (raw API spillover, `init_db.py:111`). Stored as
  * strings, parsed with `from_json` only where consumed — the scan stays a
  * plain string column everywhere else.
  */
object JsonColumns {

  /** metrics_json → map<string,double> (the 11 numeric metrics). */
  def metricsMap(c: Column): Column =
    from_json(c, MapType(StringType, DoubleType))

  /** extra → map<string,string>: stringly-typed like the raw API payload. */
  def extraMap(c: Column): Column =
    from_json(c, MapType(StringType, StringType))

  /** Registry rows with a parsed metrics map alongside the raw JSON. */
  def withParsedMetrics(registry: DataFrame): DataFrame =
    registry.withColumn("metrics", metricsMap(col("metrics_json")))

  /** One metric extracted without materializing the whole map. */
  def metric(registry: DataFrame, name: String): DataFrame =
    registry.select(col("model_version"),
      get_json_object(col("metrics_json"), s"$$.$name").cast("double").as(name))
}
