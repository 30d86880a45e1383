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

  test("overwriteDynamicPartitions replaces only the batch's partitions, wholesale") {
    val store = freshStore()
    // base: three day-partitions, two rows each
    store.overwriteDynamicPartitions("fct_daily",
      Seq(("d1", 1L, "a"), ("d1", 2L, "b"),
          ("d2", 3L, "c"), ("d2", 4L, "d"),
          ("d3", 5L, "e"), ("d3", 6L, "f"))
        .toDF("day", "id", "v"), Seq("day"))
    // restatement: d2 wholesale (one row survives — the dropped row must
    // VANISH, which is what distinguishes this from upsert) + new d4
    store.overwriteDynamicPartitions("fct_daily",
      Seq(("d2", 3L, "RESTATED"), ("d4", 7L, "g")).toDF("day", "id", "v"), Seq("day"))
    val got = store.read("fct_daily").collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("id"), r.getAs[String]("v"))).toSet
    assert(got == Set(
      ("d1", 1L, "a"), ("d1", 2L, "b"),      // untouched partition intact
      ("d2", 3L, "RESTATED"),                 // replaced wholesale: id=4 gone
      ("d3", 5L, "e"), ("d3", 6L, "f"),      // untouched partition intact
      ("d4", 7L, "g")))                       // new partition appended
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

  // ---- field-wise merge (transaction_service.py:78-126) --------------------

  private val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
  private val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  /** (id, master, source, notes, validated, exclude, updated_at) */
  private def ucRows(rows: (String, String, Option[String], Option[String],
      Option[Boolean], Option[Boolean], java.sql.Timestamp)*) =
    rows.toDF("transaction_id", "master_category", "source_category",
      "notes", "validated", "exclude_from_forecast", "updated_at")

  private val ucAssigned = Seq("master_category", "source_category")
  private val ucProvided = Seq("notes", "validated", "exclude_from_forecast")
  private val ucDefaults = Map(
    "validated" -> lit(false), "exclude_from_forecast" -> lit(false))

  test("mergeFieldwise: a notes-only update preserves every other stored field") {
    val existing = ucRows(
      ("t1", "Dining", Some("src"), Some("old note"), Some(true), Some(true), t0))
    // reference semantics: master/source assigned from the request even if
    // null; notes provided; validated/exclude NOT provided (null) -> kept
    val batch = Seq(("t1", "Dining", Option.empty[String], Some("new note"),
      Option.empty[Boolean], Option.empty[Boolean]))
      .toDF("transaction_id", "master_category", "source_category",
        "notes", "validated", "exclude_from_forecast")
    val out = TableStore.mergeFieldwise(existing, batch, "transaction_id",
      ucAssigned, ucProvided, ucDefaults, "updated_at" -> lit(t1)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("master_category") == "Dining")
    assert(r.getAs[String]("source_category") == null)   // assigned: overwritten
    assert(r.getAs[String]("notes") == "new note")
    assert(r.getAs[Boolean]("validated"))                // preserved
    assert(r.getAs[Boolean]("exclude_from_forecast"))    // preserved
    assert(r.getAs[java.sql.Timestamp]("updated_at") == t1) // touched
  }

  test("mergeFieldwise: created rows take defaults; untouched rows pass through") {
    val existing = ucRows(
      ("t1", "Gas", Some("s"), None, Some(false), Some(false), t0))
    val batch = Seq(("t9", "Rent", Some("manual"), Option.empty[String],
      Option.empty[Boolean], Option.empty[Boolean]))
      .toDF("transaction_id", "master_category", "source_category",
        "notes", "validated", "exclude_from_forecast")
    val got = TableStore.mergeFieldwise(existing, batch, "transaction_id",
      ucAssigned, ucProvided, ucDefaults, "updated_at" -> lit(t1))
      .collect().map(r => r.getAs[String]("transaction_id") -> r).toMap
    // created row: unprovided booleans default false, touch stamped
    assert(got("t9").getAs[String]("master_category") == "Rent")
    assert(!got("t9").getAs[Boolean]("validated"))
    assert(!got("t9").getAs[Boolean]("exclude_from_forecast"))
    assert(got("t9").getAs[java.sql.Timestamp]("updated_at") == t1)
    // untouched row: byte-identical, old updated_at kept
    assert(got("t1").getAs[String]("master_category") == "Gas")
    assert(got("t1").getAs[java.sql.Timestamp]("updated_at") == t0)
  }

  test("upsertFieldwise persists the merge through the store (missing table included)") {
    val store = freshStore()
    val b1 = Seq(("t1", "Dining", Some("s"), Some("n1"), Some(true), Option.empty[Boolean]))
      .toDF("transaction_id", "master_category", "source_category",
        "notes", "validated", "exclude_from_forecast")
    store.upsertFieldwise("uc", b1, "transaction_id",
      ucAssigned, ucProvided, ucDefaults, "updated_at" -> lit(t0))
    val b2 = Seq(("t1", "Dining", Some("s"), Option.empty[String],
      Option.empty[Boolean], Some(true)))
      .toDF("transaction_id", "master_category", "source_category",
        "notes", "validated", "exclude_from_forecast")
    store.upsertFieldwise("uc", b2, "transaction_id",
      ucAssigned, ucProvided, ucDefaults, "updated_at" -> lit(t1))
    val r = store.read("uc").collect().head
    assert(r.getAs[String]("notes") == "n1")            // kept from batch 1
    assert(r.getAs[Boolean]("validated"))               // kept from batch 1
    assert(r.getAs[Boolean]("exclude_from_forecast"))   // updated by batch 2
    assert(r.getAs[java.sql.Timestamp]("updated_at") == t1)
  }

  test("mergeFieldwise rejects duplicate batch keys loudly") {
    val existing = ucRows(("t1", "Gas", Some("s"), None, Some(false), Some(false), t0))
    val batch = Seq(
      ("t1", "Dining", Option.empty[String], Option.empty[String],
        Option.empty[Boolean], Option.empty[Boolean]),
      ("t1", "Rent", Option.empty[String], Option.empty[String],
        Option.empty[Boolean], Option.empty[Boolean]))
      .toDF("transaction_id", "master_category", "source_category",
        "notes", "validated", "exclude_from_forecast")
    val e = intercept[Exception] {
      TableStore.mergeFieldwise(existing, batch, "transaction_id",
        ucAssigned, ucProvided, ucDefaults, "updated_at" -> lit(t1)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("duplicate batch rows"))
  }

  test("mergeFieldwise rejects null keys loudly") {
    val existing = ucRows(("t1", "Gas", Some("s"), None, Some(false), Some(false), t0))
    val batch = Seq((Option.empty[String], "Rent", Option.empty[String],
      Option.empty[String], Option.empty[Boolean], Option.empty[Boolean]))
      .toDF("transaction_id", "master_category", "source_category",
        "notes", "validated", "exclude_from_forecast")
    val e = intercept[Exception] {
      TableStore.mergeFieldwise(existing, batch, "transaction_id",
        ucAssigned, ucProvided, ucDefaults, "updated_at" -> lit(t1)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("mergeFieldwise"))
  }
}
