package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSketchSpec extends SparkSpec {

  private val W = 8
  private val D = 4

  /** Cells after aggregating `items` spread over many partitions (forces
    * partial buffers, serialization, and merges). */
  private def cells(items: Seq[String], parts: Int = 7): Seq[Long] = {
    import spark.implicits._
    items.toDF("x").repartition(parts)
      .agg(CountMinSketch(col("x"), W, D).as("sk"))
      .head.getSeq[Long](0)
  }

  /** The reference estimate: min over rows of the item's cell. */
  private def estimate(sk: Seq[Long], item: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = CountMinSketch.base60(md, item.getBytes("UTF-8"))
    (0 until D).map(j => sk(j * W + CountMinSketch.bucket(h, j, W))).min
  }

  test("estimates never underestimate; each row's cells sum to n") {
    val rnd = new scala.util.Random(7)
    val items = Seq.fill(500)(s"item${rnd.nextInt(40)}")
    val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = cells(rnd.shuffle(items))
    // every row of counters partitions the stream: row sums are exactly n
    (0 until D).foreach { j =>
      assert(sk.slice(j * W, (j + 1) * W).sum == items.size.toLong)
    }
    trueCounts.foreach { case (item, t) =>
      assert(estimate(sk, item) >= t, s"$item underestimated")
    }
  }

  test("cells are partitioning-independent (commutative sums)") {
    val items = (0 until 300).map(i => s"k${i % 23}")
    assert(cells(items, parts = 1) == cells(items, parts = 13))
  }

  test("exact when no bucket collides (few distinct items)") {
    // two items whose buckets differ in at least one row: estimate is exact
    val items = Seq.fill(17)("alpha") ++ Seq.fill(5)("beta")
    val sk = cells(items)
    // with only 2 distinct items, a full 4-row collision needs all 4
    // buckets equal — check the fixture pair actually separates
    val md = java.security.MessageDigest.getInstance("MD5")
    val ha = CountMinSketch.base60(md, "alpha".getBytes("UTF-8"))
    val hb = CountMinSketch.base60(md, "beta".getBytes("UTF-8"))
    val collideAll = (0 until D).forall { j =>
      CountMinSketch.bucket(ha, j, W) == CountMinSketch.bucket(hb, j, W)
    }
    assert(!collideAll, "test fixture degenerate: pick different items")
    assert(estimate(sk, "alpha") == 17L)
    assert(estimate(sk, "beta") == 5L)
  }

  test("nulls are skipped, not counted") {
    import spark.implicits._
    val sk = Seq(Some("a"), None, Some("a"), None).toDF("x")
      .agg(CountMinSketch(col("x"), W, D).as("sk"))
      .head.getSeq[Long](0)
    assert(sk.sum == 2L * D) // two non-null updates, one cell per row each
  }

  test("grouped sketches stay per-group") {
    import spark.implicits._
    val df = Seq(("g1", "x"), ("g1", "x"), ("g2", "z")).toDF("g", "v")
    val got = df.groupBy("g").agg(CountMinSketch(col("v"), W, D).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(estimate(got("g1"), "x") == 2L)
    assert(estimate(got("g2"), "z") == 1L)
    assert(got("g1").sum == 2L * D && got("g2").sum == 1L * D)
  }

  test("base60 matches the SQL md5-prefix arithmetic") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq("en", "zh", "alpha", "").foreach { s =>
      val viaSql = Seq(s).toDF("x")
        .select(conv(substring(md5(col("x")), 1, 15), 16, 10).cast("long"))
        .head.getLong(0)
      assert(CountMinSketch.base60(md, s.getBytes("UTF-8")) == viaSql, s"mismatch for '$s'")
    }
  }

  test("rejects bad geometry and non-string input") {
    intercept[IllegalArgumentException] { CountMinSketch(col("x"), 1, 4) }
    intercept[IllegalArgumentException] { CountMinSketch(col("x"), 8, 0) }
    intercept[IllegalArgumentException] { CountMinSketch(col("x"), 8, 5) }
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(1, 2).toDF("x").agg(CountMinSketch(col("x"), W, D)).head
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
