package graft.finance

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import scala.jdk.CollectionConverters._

/** Semantics of the staging transforms, focused on the documented edge cases
  * of the reference's hardest model (`stg_simplefin.sql:65-78`): reconnection
  * duplicates across account_ids are dropped; legitimate same-day repeats
  * within one account_id survive.
  */
class StagingSpec extends SparkSpec {

  private def simplefinRows(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, Schemas.simplefinRaw)

  private def raw(
      txnId: String, accountId: String, accountName: String,
      amount: String, date: String, desc: String,
      importTs: String): Row =
    Row(txnId, accountId, accountName, "dom", "Bank",
      new java.math.BigDecimal(amount), 1700000000L, date, 1700000000L, date,
      desc, false, null, importTs, importTs.take(10))

  private val noMapping = spark.createDataFrame(
    Seq.empty[Row].asJava, Schemas.accountMappingSimplefin)
  private val noExclusions = spark.createDataFrame(
    Seq.empty[Row].asJava, Schemas.transactionExclusions)

  test("W1: latest import wins per transaction_id") {
    val src = simplefinRows(Seq(
      raw("t1", "a1", "Checking", "10.00", "2024-01-01", "coffee", "2024-01-02 00:00:00"),
      raw("t1", "a1", "Checking", "10.00", "2024-01-01", "coffee", "2024-01-05 00:00:00"),
      raw("t2", "a1", "Checking", "5.00", "2024-01-01", "tea", "2024-01-02 00:00:00")))
    val out = Staging.stgSimplefin(src, noMapping, noExclusions)
    assert(out.count() == 2)
    val t1 = out.filter("transaction_id = 't1'").select("import_timestamp")
      .collect().map(_.getTimestamp(0).toString)
    assert(t1.toSeq == Seq("2024-01-05 00:00:00.0"))
  }

  test("W3+W4: reconnection duplicates across account_ids are dropped, newest connection wins") {
    // Same logical transaction (institution, name, date, amount, description)
    // under two account_ids — the reconnected (newer-import) account survives.
    val src = simplefinRows(Seq(
      raw("t_old", "acc_old", "Checking (1234)", "42.00", "2024-01-01", "rent", "2024-01-02 00:00:00"),
      raw("t_new", "acc_new", "Checking (5678)", "42.00", "2024-01-01", "rent", "2024-03-01 00:00:00")))
    val out = Staging.stgSimplefin(src, noMapping, noExclusions)
    assert(out.select("transaction_id").collect().map(_.getString(0)).toSeq == Seq("t_new"))
  }

  test("W3+W4: legitimate same-day repeats within one account_id all survive") {
    // Two genuinely identical purchases, same account — must BOTH survive
    // (they share the winning dense_rank).
    val src = simplefinRows(Seq(
      raw("t1", "a1", "Checking", "4.50", "2024-01-01", "coffee", "2024-01-02 00:00:00"),
      raw("t2", "a1", "Checking", "4.50", "2024-01-01", "coffee", "2024-01-02 00:00:00")))
    val out = Staging.stgSimplefin(src, noMapping, noExclusions)
    assert(out.count() == 2)
  }

  test("exclusion patterns anti-filter with ILIKE semantics") {
    val src = simplefinRows(Seq(
      raw("t1", "a1", "Checking", "10.00", "2024-01-01", "CREDIT CARD PAYMENT thanks", "2024-01-02 00:00:00"),
      raw("t2", "a1", "Checking", "5.00", "2024-01-01", "groceries", "2024-01-02 00:00:00")))
    val excl = spark.createDataFrame(
      Seq(Row("%credit card payment%")).asJava, Schemas.transactionExclusions)
    val out = Staging.stgSimplefin(src, noMapping, excl)
    assert(out.select("transaction_id").collect().map(_.getString(0)).toSeq == Seq("t2"))
  }

  test("conditional mapping join: empty mapping account_id matches any; fallback chain") {
    val src = simplefinRows(Seq(
      raw("t1", "a1", "Checking", "1.00", "2024-01-01", "x", "2024-01-02 00:00:00"),
      raw("t2", "a2", "Savings", "1.00", "2024-01-01", "y", "2024-01-02 00:00:00"),
      raw("t3", "a3", "Unmapped", "1.00", "2024-01-01", "z", "2024-01-02 00:00:00")))
    val mapping = spark.createDataFrame(Seq(
      Row("Checking", "", "Junior Checking"),   // empty id → matches any account_id
      Row("Savings", "a9", "Wrong Savings")     // id mismatch → no match
    ).asJava, Schemas.accountMappingSimplefin)
    val out = Staging.stgSimplefin(src, mapping, noExclusions)
      .select("transaction_id", "mapped_account_name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("t1") == "Junior Checking")
    assert(out("t2") == "Savings")   // coalesce falls back to source name
    assert(out("t3") == "Unmapped")
  }

  test("historic: MD5 surrogate key disambiguates duplicate raw rows") {
    val rows = Seq(
      Row("Old Checking", null, "12.34", "2019-05-01", "pizza", "Food", "Dining", "01/02/2020"),
      Row("Old Checking", null, "12.34", "2019-05-01", "pizza", "Food", "Dining", "01/02/2020"))
    val src = spark.createDataFrame(rows.asJava, Schemas.historicRaw)
    val noMap = spark.createDataFrame(Seq.empty[Row].asJava, Schemas.accountMappingHistoric)
    val out = Staging.stgHistoric(src, noMap)
    val ids = out.select("transaction_id").collect().map(_.getString(0))
    assert(ids.length == 2 && ids.distinct.length == 2)
    assert(ids.forall(_.startsWith("HIST_TRN_")))
    // MM/DD/YYYY import-date parse
    val d = out.select("import_date").collect().map(_.getDate(0).toString)
    assert(d.forall(_ == "2020-01-02"))
  }

  test("stgPredictions: W5 latest prediction per transaction wins") {
    val rows = Seq(
      Row("t1", "Dining", new java.math.BigDecimal("0.9000"), "v1",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      Row("t1", "Travel", new java.math.BigDecimal("0.8000"), "v2",
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
    val src = spark.createDataFrame(rows.asJava, Schemas.predictedTransactions)
    val out = Staging.stgPredictions(src)
    val got = out.select("predicted_master_category").collect().map(_.getString(0)).toSeq
    assert(got == Seq("Travel"))
  }
}
