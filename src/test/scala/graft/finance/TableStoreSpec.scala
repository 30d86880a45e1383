package graft.finance

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TableStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-store").toString)

  test("appendNew never updates existing rows (append-only incremental)") {
    val store = freshStore()
    store.appendNew("fct", Seq(("t1", "Dining")).toDF("transaction_id", "cat"), "transaction_id")
    store.appendNew("fct",
      Seq(("t1", "CHANGED"), ("t2", "Travel")).toDF("transaction_id", "cat"), "transaction_id")
    val got = store.read("fct").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("t1" -> "Dining", "t2" -> "Travel"))
  }

  test("upsert replaces rows by key and keeps untouched keys") {
    val store = freshStore()
    store.upsert("pred", Seq(("t1", "v1"), ("t2", "v1")).toDF("transaction_id", "mv"), "transaction_id")
    store.upsert("pred", Seq(("t2", "v2"), ("t3", "v2")).toDF("transaction_id", "mv"), "transaction_id")
    val got = store.read("pred").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("t1" -> "v1", "t2" -> "v2", "t3" -> "v2"))
  }

  test("bucketed tables join without a shuffle; re-overwrite cleans old generation") {
    val root = Files.createTempDirectory("graft-bk")
    val store = new TableStore(spark, root.toString)
    val a = (0 until 1000).map(i => (s"t$i", i * 2)).toDF("transaction_id", "x")
    val b = (0 until 1000).map(i => (s"t$i", i * 3)).toDF("transaction_id", "y")
    store.overwriteBucketed("bk_a", a, "transaction_id", numBuckets = 4)
    store.overwriteBucketed("bk_a", a, "transaction_id", numBuckets = 4) // repoint + cleanup
    store.overwriteBucketed("bk_b", b, "transaction_id", numBuckets = 4)
    import scala.jdk.CollectionConverters._
    val genDirs = Files.list(root).iterator().asScala
      .count(_.getFileName.toString.startsWith(".bk_a__gen"))
    assert(genDirs == 1, s"stale bucketed generations not cleaned (found $genDirs)")
    val joined = spark.table("bk_a").join(spark.table("bk_b"), "transaction_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == 1000)
  }

  test("registry flags recomputed by window: latest vs active") {
    val reg = Seq(
      ("v1", "2024-01-01 00:00:00", "trained"),
      ("v2", "2024-02-01 00:00:00", "trained"),
      ("v3", "2024-03-01 00:00:00", "skipped")) // newest but not trained
      .toDF("model_version", "ts", "status")
      .select(col("model_version"), col("ts").cast("timestamp").as("training_timestamp"), col("status"))
    val got = TableStore.recomputeRegistryFlags(reg)
      .select("model_version", "is_latest", "is_active")
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(got("v3") == (true, false))  // latest run, inactive (skipped)
    assert(got("v2") == (false, true))  // active model = newest trained
    assert(got("v1") == (false, false))
  }
}
