package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSampleSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def corpus(n: Int, group: String): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, group)).toDF("id", "g")
  }

  private def sample(df: DataFrame, rates: Map[String, Double], dflt: Double = 0.0) =
    MixtureSample.resample(df, col("id"), col("g"), rates, dflt)

  test("integer rates give exact copy counts") {
    val out = sample(corpus(100, "a"), Map("a" -> 2.0)).collect()
    assert(out.length == 200)
    assert(out.map(r => r.getAs[Long]("copy")).toSet == Set(0L, 1L))
    val perId = out.groupBy(_.getAs[Long]("id")).view.mapValues(_.length).toMap
    assert(perId.values.forall(_ == 2))
  }

  test("rate zero drops the group; default rate covers unlisted groups") {
    import spark.implicits._
    val df = Seq((1L, "keep"), (2L, "drop"), (3L, "other")).toDF("id", "g")
    val out = sample(df, Map("keep" -> 1.0, "drop" -> 0.0), dflt = 1.0)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
  }

  test("fractional rate hits the expected proportion and is deterministic") {
    val df = corpus(2000, "a")
    val a = sample(df, Map("a" -> 0.5)).select("id").collect().map(_.getLong(0)).sorted
    // binomial(2000, 0.5): ±5 sigma ≈ ±112
    assert(a.length > 888 && a.length < 1112, s"kept ${a.length} of 2000 at rate 0.5")
    val b = sample(df, Map("a" -> 0.5)).select("id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq) // pure function of the id — no rand() anywhere
  }

  test("mixed rate 1.5 emits every row once and roughly half twice") {
    val out = sample(corpus(2000, "a"), Map("a" -> 1.5)).collect()
    val perId = out.groupBy(_.getAs[Long]("id")).view.mapValues(_.length).toMap
    assert(perId.size == 2000) // floor(1.5)=1: nobody disappears
    val doubled = perId.values.count(_ == 2)
    assert(perId.values.forall(n => n == 1 || n == 2))
    assert(doubled > 888 && doubled < 1112, s"$doubled of 2000 doubled at rate 1.5")
  }

  test("sampling decision is independent across groups (same ids, different thresholds)") {
    import spark.implicits._
    // same id space in two groups: group rates must cut independently —
    // 0.3 subset of the bucket space must be a prefix-subset of 0.6's
    val df = (0L until 500L).flatMap(i => Seq((i, "lo"), (i, "hi"))).toDF("id", "g")
    val out = sample(df, Map("lo" -> 0.3, "hi" -> 0.6)).collect()
    val lo = out.filter(_.getString(1) == "lo").map(_.getLong(0)).toSet
    val hi = out.filter(_.getString(1) == "hi").map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi)) // thresholds nest: bucket < 3000 implies bucket < 6000
  }

  test("negative rates are rejected") {
    intercept[IllegalArgumentException] {
      sample(corpus(1, "a"), Map("a" -> -0.1)).collect()
    }
    ()
  }
}
