package graft

import org.apache.spark.sql.functions._

/** Gate on the SkewBench harness itself: the three join arms and the two
  * distinct arms must be result-equivalent on a real fixture (the bench's
  * checksum agreement is asserted at bench time too, but a broken arm
  * should fail the suite, not a manual run). */
class SkewBenchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("skewed fact concentrates ~90% of rows on the hot key") {
    val fact = SkewBench.skewedFact(spark, sfDir)
    val total = fact.count().toDouble
    val hot = fact.filter(col("k") === -1L).count().toDouble
    assert(hot / total > 0.85 && hot / total < 0.95,
      s"hot share ${hot / total} outside [0.85, 0.95]")
  }

  test("naive, salted join arms and the fan-out dim are result-equivalent") {
    val fact = SkewBench.skewedFact(spark, sfDir)
    val dim = SkewBench.dimOf(fact)
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("k"), col("event_id"), col("variant"),
          col("weight"), col("value")))).head()
      (r.getLong(0), r.getLong(1))
    }
    val naive = sig(fact.join(dim, "k"))
    val salted = sig(graft.operators.Skew.saltedJoin(
      fact, dim, Seq("k"), saltBy = col("event_id")))
    // Threshold 100: the sf0.001 hot key (~900 rows) salts, cold keys ride
    // unsalted — both regimes of the single-pass routing carry rows here.
    val saltedHot = sig(graft.operators.Skew.saltedJoinHot(
      fact, dim, Seq("k"), saltBy = col("event_id"), hotRowThreshold = 100L))
    assert(naive._1 > 0L, "empty join output")
    assert(naive == salted, s"salted join diverged: $naive vs $salted")
    assert(naive == saltedHot, s"salted_hot join diverged: $naive vs $saltedHot")
  }

  test("two-phase distinct equals count_distinct on the skewed key") {
    val fact = SkewBench.skewedFact(spark, sfDir)
    val naive = fact.groupBy(col("k"))
      .agg(count_distinct(col("value")).as("n_distinct"))
    val twoPhase = graft.operators.Skew.distinctCountSkewAware(fact, Seq("k"), "value")
    assert(naive.exceptAll(twoPhase).isEmpty && twoPhase.exceptAll(naive).isEmpty,
      "two-phase distinct diverged from count_distinct")
  }
}
