package graft.io

import graft.SparkSpec
import graft.io.Compaction.{FileInfo, planGroups}

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("planGroups: exactly-once, bounded multi-file groups, oversized isolated") {
    val files = Seq(
      FileInfo("a", 700), FileInfo("b", 300), FileInfo("c", 300),
      FileInfo("d", 200), FileInfo("e", 1500), FileInfo("f", 100))
    val groups = planGroups(files, targetBytes = 1000)
    // every file in exactly one group
    val planned = groups.flatMap(_.files.map(_.path))
    assert(planned.sorted == files.map(_.path).sorted)
    // no multi-file group exceeds the target
    assert(groups.filter(_.files.size > 1).forall(_.bytes <= 1000))
    // the 1500-byte file is isolated, not dropped
    val big = groups.find(_.files.exists(_.path == "e")).get
    assert(big.files.size == 1)
  }

  test("planGroups is deterministic under input order") {
    val files = (1 to 50).map(i => FileInfo(s"f$i", (i * 37 % 400 + 10).toLong))
    val a = planGroups(files, 512).map(_.files.map(_.path))
    val b = planGroups(scala.util.Random.shuffle(files.toList), 512).map(_.files.map(_.path))
    assert(a == b)
  }

  test("compact merges small parquet files, preserves every row, leaves big files unread") {
    val dir = java.nio.file.Files.createTempDirectory("compaction").toString + "/t"
    // 12 tiny single-file writes -> 12 small files
    (0 until 12).foreach { i =>
      Seq.tabulate(50)(j => (i.toLong * 50 + j, s"row-$i-$j"))
        .toDF("id", "payload")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = Compaction.listDataFiles(spark, dir)
    assert(before.size == 12)
    val target = before.map(_.bytes).sum / 3 // aim for ~3 merged files
    val stats = Compaction.compact(spark, dir, target)
    assert(stats.filesBefore == 12)
    assert(stats.filesAfter < 12, s"expected fewer files, got ${stats.filesAfter}")
    // not a row lost or duplicated, contents identical
    val back = spark.read.parquet(dir)
    assert(back.count() == 600)
    assert(back.select("id").distinct().count() == 600)
    // nothing left of the staging scaffolding
    val leftovers = new java.io.File(dir).getParentFile.listFiles()
      .map(_.getName).filter(_.contains("_compact"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }
}
