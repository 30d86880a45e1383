package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorder2 interleaves bits: a at even positions, b at odd") {
    val rows = Seq((3L, 0L), (0L, 3L), (1L, 1L), (2L, 1L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // a=0b11 -> bits 0,2 = 5; b=0b11 -> bits 1,3 = 10; (1,1) -> 3;
    // (2,1): a bit1->pos2 (4) + b bit0->pos1 (2) = 6; 16-bit max -> 2^32-1
    assert(rows.toSeq == Seq(5L, 10L, 3L, 6L, 4294967295L))
  }

  test("zorder2 masks negative inputs to their low bits instead of corrupting the key") {
    // -1 = ...1111: low 2 bits are 11 -> same interleave as (3, 0)
    val z = Seq((-1L, 0L)).toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"), 2).as("z"))
      .head.getLong(0)
    assert(z == 5L)
  }

  test("writeZOrdered rejects an input that already has a _zkey column") {
    val df = Seq((1, 2, 9L)).toDF("x", "y", "_zkey")
    val e = intercept[IllegalArgumentException](
      Layout.writeZOrdered(df, "/tmp/never-written", "x", "y"))
    assert(e.getMessage.contains("_zkey"))
  }

  test("zorder2 is monotone within a row/column of the grid") {
    // along a fixed b, increasing a must increase z (prefix bits agree)
    val z = (0 until 64)
      .map(a => (a.toLong, 7L)).toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"), 6).as("z"))
      .collect().map(_.getLong(0))
    assert(z.sameElements(z.sorted))
  }

  test("z-clustering keeps both dimensions prunable where linear sort loses one") {
    // 64x64 grid; measure how many 256-row consecutive blocks a band
    // predicate on the SECOND column touches under each layout — a proxy
    // for parquet row-group min/max pruning
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y))
      .toDF("x", "y")
    def blocksTouched(sorted: org.apache.spark.sql.DataFrame): Long = {
      val indexed = sorted.coalesce(1)
        .withColumn("pos",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("_k"))) - 1)
        .withColumn("block", floor(col("pos") / 256))
      indexed.filter(col("y").between(8, 15))
        .select(col("block")).distinct().count()
    }
    val byX = grid.withColumn("_k", col("x") * 64 + col("y"))
    val byZ = grid.withColumn("_k", Layout.zorder2(col("x"), col("y"), 6))
    val linear = blocksTouched(byX)
    val zorder = blocksTouched(byZ)
    // x-major sort scatters a y-band across every x block (all 16);
    // z-order confines it to the blocks of 4 grid rectangles
    assert(linear == 16, s"x-major should touch all 16 blocks, got $linear")
    assert(zorder <= 8, s"z-order should touch at most half the blocks, got $zorder")
  }

  test("writeZOrdered round-trips the data and clusters files by rectangles") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y)).toDF("x", "y")
    Layout.writeZOrdered(grid, dir, "x", "y", bits = 5, numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1024)
    assert(back.columns.toSet == Set("x", "y")) // _zkey dropped
    // each file covers a bounded rectangle: per-file x-range and y-range
    // must both be narrower than the full domain in at least one file set —
    // concretely no file may span the whole of BOTH dimensions
    val spans = back.withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    // sampled range boundaries may leave one straddling file; the rest must
    // be rectangle-bounded (that bound is what row-group pruning uses)
    val unbounded = spans.count { case (xs, ys) => xs == 31 && ys == 31 }
    assert(spans.nonEmpty && unbounded <= 1,
      s"too many files span the full domain in both dims: ${spans.mkString(",")}")
  }
}
