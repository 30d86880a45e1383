package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkSpec {

  /** Run the aggregate over `items` spread across many partitions (forces
    * partial buffers, serialization, and merges) and return the summary. */
  private def summarize(items: Seq[String], k: Int): Map[String, Long] = {
    import spark.implicits._
    items.toDF("x").repartition(7)
      .agg(FrequentItems(col("x"), k).as("fi"))
      .head.getMap[String, Long](0).toMap
  }

  test("exact when distinct <= k, across partitions and merges") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val got = summarize(scala.util.Random.shuffle(items), k = 8)
    assert(got == Map("a" -> 40L, "b" -> 25L, "c" -> 3L))
  }

  test("weights are lower bounds within n/(k+1), heavy items always present") {
    val rnd = new scala.util.Random(42)
    // zipfian-ish: a few heavy items over a long tail of 200 distinct
    val items = Seq.fill(600)("heavy1") ++ Seq.fill(400)("heavy2") ++
      Seq.fill(1000)(s"tail${rnd.nextInt(200)}")
    val n = items.size
    val k = 10
    val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = summarize(rnd.shuffle(items), k)
    assert(got.size <= k)
    val slack = n / (k + 1)
    got.foreach { case (item, w) =>
      val t = trueCounts(item)
      assert(w <= t, s"$item overcounted: $w > $t")
      assert(w >= t - slack, s"$item undercounted past the bound: $w < $t - $slack")
    }
    // guarantee: anything with true count > n/(k+1) must hold a slot
    trueCounts.filter(_._2 > slack).keys.foreach { heavy =>
      assert(got.contains(heavy), s"$heavy (count ${trueCounts(heavy)}) evicted")
    }
  }

  test("nulls are skipped, not counted") {
    import spark.implicits._
    val got = Seq(Some("a"), None, Some("a"), None).toDF("x")
      .agg(FrequentItems(col("x"), 4).as("fi"))
      .head.getMap[String, Long](0).toMap
    assert(got == Map("a" -> 2L))
  }

  test("grouped summaries stay per-group (no cross-group state)") {
    import spark.implicits._
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z")).toDF("g", "v")
    val got = df.groupBy("g").agg(FrequentItems(col("v"), 4).as("fi"))
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1).toMap).toMap
    assert(got == Map("g1" -> Map("x" -> 2L, "y" -> 1L), "g2" -> Map("z" -> 1L)))
  }

  test("rejects k < 1 and non-string input") {
    intercept[IllegalArgumentException] { FrequentItems(col("x"), 0) }
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(1, 2).toDF("x").agg(FrequentItems(col("x"), 4)).head
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
