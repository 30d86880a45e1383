package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One entry in the driver-facing query catalog.
  *
  * @param name   stable key, becomes the `SparkEntry.queries` map key and the
  *               driver's parquet/oracle artifact name
  * @param doc    which SURVEY.md §2 operator(s) this exercises
  * @param oracle DuckDB-runnable ANSI SQL over the same parquet tables
  *               (bare table names, e.g. `FROM lineitem`); None when the op
  *               is not SQL-expressible → driver falls back to rows-only.
  * @param fn     the Spark implementation: (session, sfDir) => result
  *
  * Determinism contract (the driver hash-compares against DuckDB):
  *  - column names identical between `fn` output and `oracle` result
  *  - money-ish aggregates go through DECIMAL(18,2), never raw double sums
  *    (double addition is order-dependent; decimal is exact on both engines)
  *  - no LIMIT without a total order that includes a unique tiebreak key
  */
final case class QueryDef(
    name: String,
    doc: String,
    oracle: Option[String])(
    val fn: (SparkSession, String) => DataFrame)
