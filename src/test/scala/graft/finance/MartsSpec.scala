package graft.finance

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class MartsSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal canonical-shape frame for feature tests. */
  private def canonical(rows: (String, String, String, String)*): DataFrame = {
    // (transaction_id, amount-or-null, transacted_date, description)
    val df = rows.toSeq.toDF("transaction_id", "amount_s", "transacted_date_s", "description")
    df.select(
      col("transaction_id"),
      lit(null).cast("string").as("account_id"),
      lit(null).cast("string").as("original_account_name"),
      lit("Checking").as("account_name"),
      lit(null).cast("string").as("detailed_account_name"),
      lit(null).cast("string").as("owner_name"),
      lit(null).cast("string").as("institution_domain"),
      lit("Bank").as("institution_name"),
      col("amount_s").cast("decimal(18,2)").as("amount"),
      lit(null).cast("timestamp").as("posted"),
      lit(null).cast("date").as("posted_date"),
      lit(null).cast("timestamp").as("transacted_at"),
      col("transacted_date_s").cast("date").as("transacted_date"),
      col("description"),
      lit(null).cast("boolean").as("pending"),
      lit(null).cast("string").as("source_category"),
      lit(null).cast("string").as("master_category"),
      lit(null).cast("timestamp").as("import_timestamp"),
      lit(null).cast("timestamp").as("import_date"),
      lit("simplefin").as("source_name"))
  }

  test("day_of_week follows the pandas Monday=0 convention") {
    // 2024-01-01 was a Monday; 2024-01-07 a Sunday.
    val out = Marts.intTrxnsFeatures(canonical(
      ("mon", "1.00", "2024-01-01", "x"),
      ("sun", "1.00", "2024-01-07", "x")))
      .select("transaction_id", "day_of_week")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out("mon") == 0)
    assert(out("sun") == 6)
  }

  test("amount_bucket boundaries and null → 5") {
    val out = Marts.intTrxnsFeatures(canonical(
      ("micro", "-10.00", "2024-01-01", "x"),
      ("small", "50.00", "2024-01-01", "x"),
      ("medium", "100.00", "2024-01-01", "x"),
      ("large", "-500.00", "2024-01-01", "x"),
      ("huge", "500.01", "2024-01-01", "x"),
      ("nul", null, "2024-01-01", "x")))
      .select("transaction_id", "amount_bucket", "is_negative")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out("micro") == (0, 1))
    assert(out("small") == (1, 0))
    assert(out("medium") == (2, 0))
    assert(out("large") == (3, 1))
    assert(out("huge") == (4, 0))
    assert(out("nul") == (5, 0))
  }

  test("keyword flags match case-insensitively on substrings") {
    val out = Marts.intTrxnsFeatures(canonical(
      ("t1", "1.00", "2024-01-01", "STARBUCKS #123 Berkeley"),
      ("t2", "1.00", "2024-01-01", "United Airlines ticket"),
      ("t3", "1.00", "2024-01-01", null)))
    val r1 = out.filter("transaction_id = 't1'").select("has_restaurant_keyword").head.getInt(0)
    val r2 = out.filter("transaction_id = 't2'")
      .select("has_flight_keyword", "has_restaurant_keyword").head
    val r3 = out.filter("transaction_id = 't3'").select("has_hotel_keyword").head.getInt(0)
    assert(r1 == 1)
    assert((r2.getInt(0), r2.getInt(1)) == (1, 0))
    assert(r3 == 0)
  }

  test("combined_text concatenates with empty-string coalesce") {
    val out = Marts.intTrxnsFeatures(canonical(("t1", "1.00", "2024-01-01", null)))
      .select("combined_text").head.getString(0)
    assert(out == " Checking Bank")
  }

  test("intTrxns unions by name with source_name literals") {
    val sf = Staging.stgSimplefin(
      spark.createDataFrame(Seq(
        Row("t1", "a1", "Checking", "dom", "Bank", new java.math.BigDecimal("10.00"),
          1700000000L, "2024-01-01", 1700000000L, "2024-01-01", "coffee", false,
          null, "2024-01-02 00:00:00", "2024-01-02")).asJava, Schemas.simplefinRaw),
      spark.createDataFrame(Seq.empty[Row].asJava, Schemas.accountMappingSimplefin),
      spark.createDataFrame(Seq.empty[Row].asJava, Schemas.transactionExclusions))
    val hist = Staging.stgHistoric(
      spark.createDataFrame(Seq(
        Row("Old", null, "5.00", "2019-01-01", "pizza", "Food", "Dining", "")).asJava,
        Schemas.historicRaw),
      spark.createDataFrame(Seq.empty[Row].asJava, Schemas.accountMappingHistoric))
    val out = Marts.intTrxns(sf, hist)
    assert(out.columns.toSeq == Marts.canonicalColumns)
    val bySource = out.groupBy("source_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource == Map("simplefin" -> 1L, "historic" -> 1L))
    // historic row carries its master_category through the union
    assert(out.filter("source_name = 'historic'").select("master_category")
      .head.getString(0) == "Dining")
  }

  test("categorized/uncategorized split + validated incremental append-only") {
    val feats = Marts.intTrxnsFeatures(canonical(
      ("t1", "1.00", "2024-01-01", "a"),
      ("t2", "2.00", "2024-01-01", "b"),
      ("t3", "3.00", "2024-01-01", "c")))
      .withColumn("master_category",
        when(col("transaction_id") === "t1", "Dining"))
    assert(Marts.fctTrxnsCategorized(feats).select("transaction_id")
      .collect().map(_.getString(0)).toSeq == Seq("t1"))

    // t2 already validated → uncategorized = t3 only
    val validated = Seq("t2").toDF("transaction_id")
    val uncat = Marts.fctTrxnsUncategorized(feats, validated)
    assert(uncat.select("transaction_id").collect().map(_.getString(0)).toSeq == Seq("t3"))

    // incremental: only ids not already in the target come through
    val newBatch = Seq("t2", "t9").toDF("transaction_id")
    val inc = Marts.fctValidatedIncrement(validated, newBatch)
    assert(inc.collect().map(_.getString(0)).toSeq == Seq("t9"))
  }

  test("fctTrxnsWithPredictions left-joins prediction columns") {
    val feats = Marts.intTrxnsFeatures(canonical(
      ("t1", "1.00", "2024-01-01", "a"),
      ("t2", "2.00", "2024-01-01", "b")))
    val uncat = Marts.fctTrxnsUncategorized(feats,
      spark.emptyDataFrame.select(lit("x").as("transaction_id")).limit(0))
    val preds = Staging.stgPredictions(spark.createDataFrame(Seq(
      Row("t1", "Dining", new java.math.BigDecimal("0.9000"), "v1",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).asJava,
      Schemas.predictedTransactions))
    val out = Marts.fctTrxnsWithPredictions(uncat, preds)
    val byId = out.select("transaction_id", "predicted_master_category")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byId("t1").contains("Dining"))
    assert(byId("t2").isEmpty)
  }
}
