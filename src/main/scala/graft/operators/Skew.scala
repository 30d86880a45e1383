package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys (SURVEY §4, builder north star).
  *
  * AQE's skew-join handling (on by default in Spark 4) re-splits oversized
  * partitions at runtime and is the first line of defense; these explicit
  * operators are for the cases AQE cannot fix: a broadcast-ineligible
  * dimension joined on a pathological key, and high-cardinality DISTINCT
  * aggregation concentrated on few groups.
  */
object Skew {

  /** Salted equi-join for a skewed fact against a non-broadcastable (but
    * replicable) dimension: the fact side gets a deterministic salt in
    * [0, buckets) derived from `saltBy` (any roughly-unique column — a row
    * id, an event id), the dimension side is replicated once per bucket,
    * and the join key becomes (keys..., salt) — a hot key's rows spread
    * over `buckets` reducers instead of one.
    *
    * Result equals the unsalted inner join exactly (the salt is dropped).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltBy: Column,
      buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    val salted = fact.withColumn("_salt", pmod(xxhash64(saltBy), lit(buckets)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase distinct aggregation: `groupBy(keys, value).count` first
    * (spreads a hot group's distinct values over many reducers, map-side
    * combined), then `groupBy(keys).count` — equivalent to
    * `countDistinct(value)` but without funneling every occurrence of a
    * hot key through one reducer. */
  def distinctCountSkewAware(
      df: DataFrame,
      keys: Seq[String],
      value: String,
      out: String = "n_distinct"): DataFrame =
    df.select((keys :+ value).map(col): _*)
      .groupBy((keys :+ value).map(col): _*).agg(lit(1))
      // count(col) skips the NULL distinct row, matching countDistinct's
      // NULL handling while keeping all-NULL groups present with 0
      .groupBy(keys.map(col): _*).agg(count(col(value)).as(out))
}
