package graft

import org.apache.spark.sql.functions._

/** The k3 mergeable-sketch pattern on synthetic data: per-group partial HLL
  * sketches union-merged upward must estimate the true merged cardinality
  * within the sketch's documented error (lgK=12 default → ~1.6% rsd; 5%
  * is a generous gate), and merging must agree with sketching the union
  * directly — the property that makes partial reaggregation sound. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("per-group HLL sketches union-merge to the true cardinality within tolerance") {
    // 3 groups × overlapping value ranges; true distinct across groups known
    val rows = (0 until 3).flatMap { g =>
      (g * 500 until g * 500 + 1500).map(v => (g, v.toLong))
    }
    val df = rows.toDF("g", "v")
    val trueDistinct = rows.map(_._2).distinct.size.toDouble

    val partials = df.groupBy(col("g")).agg(hll_sketch_agg(col("v")).as("sk"))
    val merged = partials.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")).head.getLong(0).toDouble
    assert(math.abs(merged - trueDistinct) / trueDistinct < 0.05,
      s"merged estimate $merged vs true $trueDistinct")

    // merge-of-partials ≈ sketch-of-union (same sketch family, same lgK)
    val direct = df.agg(hll_sketch_estimate(hll_sketch_agg(col("v")))).head.getLong(0).toDouble
    assert(math.abs(merged - direct) / direct < 0.05)
  }
}
