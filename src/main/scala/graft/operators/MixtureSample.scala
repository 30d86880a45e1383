package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted mixture resampling — the domain-reweighting step
  * of a training-data pipeline: "2.2 epochs of wikipedia, 0.6 of web crawl,
  * drop 90% of forum data" expressed as per-group rates over one corpus
  * scan.
  *
  * A rate `r` for a group means every row of that group is emitted
  * `floor(r)` times, plus one more iff the row's hash bucket falls under
  * the fractional remainder — so the EXPECTED multiplicity is exactly `r`,
  * and the decision for a given row is a pure function of its id:
  *  - reproducible across runs, partitionings, and engines (md5 of the id,
  *    like the x7 shard split — never xxhash64, whose seed is
  *    engine-specific, and never `rand()`, which repartitioning reshuffles);
  *  - map-only: no shuffle, no state, trivially correct at any corpus size;
  *  - downsampling NEVER correlates with upsampling of another group (each
  *    group's threshold cuts the same uniform bucket space independently).
  *
  * Fractions are carried as integer basis points (floor(frac·10⁴ + ½)) so
  * the kept set is decided by integer compare, not float compare — the
  * oracle mirrors the same integers. Rates below 1e-4 therefore round to
  * zero; a pipeline needing finer rates raises the bucket modulus.
  */
object MixtureSample {

  val BucketModulus = 10000

  /** Per-group copy count for `idCol`: `floor(rate)` + 1 more iff the id's
    * bucket < round(frac·10⁴). Groups absent from `rates` use
    * `defaultRate`. Public so composites (d9's corpus build) can blend the
    * mixture count with other per-row copy rules in ONE pass instead of
    * unioning two scans. */
  def copies(
      idCol: Column, groupCol: Column,
      rates: Map[String, Double], defaultRate: Double): Column = {
    require((defaultRate +: rates.values.toSeq).forall(_ >= 0), "rates must be >= 0")
    def base(r: Double): Int = math.floor(r).toInt
    def thr(r: Double): Int = math.round((r - math.floor(r)) * BucketModulus).toInt
    // same positive-by-construction md5 bucket as the x7 shard split
    val bucket = graft.functions.Md5Bucket(idCol, BucketModulus)
    // rates are a small reference map: a literal when-chain keeps the whole
    // decision inside whole-stage codegen (a join against a rates table
    // would work too, but a mixture spec is config, not data)
    def pick(f: Double => Int, dflt: Int): Column =
      rates.foldLeft(lit(dflt)) { case (acc, (g, r)) =>
        when(groupCol === lit(g), lit(f(r))).otherwise(acc)
      }
    (pick(base, base(defaultRate)).cast("long")
      + when(bucket < pick(thr, thr(defaultRate)), 1L).otherwise(0L))
  }

  /** Resampled frame: each input row appears `n` times with a `copy` index
    * column (0-based) distinguishing repeats; rows whose group rate rounds
    * to zero copies disappear. Column set = input columns + `copy`. */
  def resample(
      df: DataFrame, idCol: Column, groupCol: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val n = copies(idCol, groupCol, rates, defaultRate)
    df.withColumn("_n_copies", n)
      .filter(col("_n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("_n_copies") - 1)))
      .drop("_n_copies")
  }
}
