package graft.finance

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def trxns: DataFrame =
    Seq(
      ("2023-10-05", "Dining", "-20.00"),
      ("2023-10-20", "Income", "100.00"),
      ("2023-11-05", "Dining", "-30.00"),
      ("2023-11-06", "Transfers", "-999.00"), // excluded from net change
      ("2024-02-01", "Dining", "-10.00"),
      ("2023-09-30", "Dining", "-1.00"))      // before cutoff
      .toDF("d", "master_category", "a")
      .select(col("d").cast("date").as("transacted_date"),
        col("master_category"),
        col("a").cast("decimal(18,2)").as("amount"))

  test("monthly net change excludes categories and respects cutoff") {
    val got = Analytics.monthlyNetChange(trxns)
      .collect().map(r => r.getDate(0).toString -> r.getDecimal(1).toPlainString)
    assert(got.toSeq == Seq(
      "2023-10-01" -> "80.00", "2023-11-01" -> "-30.00", "2024-02-01" -> "-10.00"))
  }

  test("cumulative savings is the running total of monthly net") {
    val got = Analytics.cumulativeSavings(trxns)
      .select("month", "cumulative_savings")
      .collect().map(r => r.getDate(0).toString -> r.getDecimal(1).toPlainString)
    assert(got.toSeq == Seq(
      "2023-10-01" -> "80.00", "2023-11-01" -> "50.00", "2024-02-01" -> "40.00"))
  }

  test("quarterly pivot uses pandas to_period('Q') labels with zero fill") {
    val out = Analytics.pivotByCategory(trxns, "quarter")
    assert(out.columns.contains("Dining"))
    val q4 = out.filter(col("period") === "2023-Q4").select("Transfers")
      .head.getDecimal(0).toPlainString
    assert(q4 == "-999.00")
    val q1 = out.filter(col("period") === "2024-Q1").select("Transfers")
      .head.getDecimal(0).toPlainString
    assert(q1 == "0.00") // zero-filled
  }

  test("yearly spend by category with exclusions") {
    val got = Analytics.yearlySpendByCategory(trxns, Seq("Transfers", "Income"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDecimal(2).toPlainString))
    assert(got.toSeq == Seq((2023, "Dining", "-51.00"), (2024, "Dining", "-10.00")))
  }

  test("balanceAsOf returns the running balance at the latest txn on-or-before each probe") {
    val ledger = Seq(
      ("acct1", "2023-10-01", "t1", "100.00"),
      ("acct1", "2023-10-10", "t2", "-30.00"),
      ("acct1", "2023-10-10", "t3", "-20.00"), // same-day: tiebreak by id
      ("acct1", "2023-11-01", "t4", "5.00"),
      ("acct2", "2023-10-05", "t5", "7.00"))
      .toDF("account_id", "d", "transaction_id", "a")
      .select(col("account_id"), col("d").cast("date").as("transacted_date"),
        col("transaction_id"), col("a").cast("decimal(18,2)").as("amount"))
    val probes = Seq(
      (1L, "acct1", "2023-10-10"),  // exactly at t2/t3 day -> 50.00 (both counted)
      (2L, "acct1", "2023-10-31"),  // between              -> 50.00
      (3L, "acct1", "2023-12-01"),  // after all            -> 55.00
      (4L, "acct2", "2023-10-01"),  // before any           -> null
      (5L, "acct3", "2023-10-01"))  // unknown account      -> null
      .toDF("probe_id", "account_id", "d")
      .select(col("probe_id"), col("account_id"), col("d").cast("date").as("as_of_date"))

    val got = Analytics.balanceAsOf(ledger, probes)
      .collect().map(r => r.getAs[Long]("probe_id") ->
        Option(r.getAs[java.math.BigDecimal]("balance")).map(_.toPlainString)).toMap
    assert(got == Map(
      1L -> Some("50.00"), 2L -> Some("50.00"), 3L -> Some("55.00"),
      4L -> None, 5L -> None))
  }
}
