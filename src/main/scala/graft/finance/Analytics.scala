package graft.finance

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The notebook analytics queries (`jupyter/notebooks/`) as
  * first-class operators: monthly/yearly/quarterly nets, pivots,
  * cumulative savings. All aggregate `amount` in DECIMAL — PG NUMERIC
  * parity and order-independent parallel sums.
  */
object Analytics {

  /** A1 (`00_getting_started.ipynb` cell 6): monthly net by category. */
  def monthlyNetByCategory(trxns: DataFrame): DataFrame =
    trxns.groupBy(
        date_trunc("month", col("transacted_date")).cast("date").as("month"),
        col("master_category"))
      .agg(sum(col("amount")).as("net_amount"))
      .orderBy(col("month"), col("master_category"))

  /** A2 (`02_net_change_by_month.ipynb` cell 3): monthly net excluding
    * category list, since a cutoff date. */
  def monthlyNetChange(
      trxns: DataFrame,
      excludeCategories: Seq[String] = Seq("Transfers", "Investments"),
      since: String = "2023-10-01"): DataFrame =
    trxns
      .filter(col("transacted_date") >= lit(since) &&
        (col("master_category").isNull ||
          !col("master_category").isin(excludeCategories: _*)))
      .groupBy(date_trunc("month", col("transacted_date")).cast("date").as("month"))
      .agg(sum(col("amount")).as("net_change"))
      .orderBy(col("month"))

  /** A3 (`01_m_and_a_charts.ipynb` cells 0/3/5): yearly spend by category
    * with an exclusion list. */
  def yearlySpendByCategory(
      trxns: DataFrame,
      excludeCategories: Seq[String] = Nil): DataFrame =
    trxns
      .filter(col("master_category").isNull ||
        !col("master_category").isin(excludeCategories: _*))
      .groupBy(year(col("transacted_date")).as("year"), col("master_category"))
      .agg(sum(col("amount")).as("total_amount"))
      .orderBy(col("year"), col("master_category"))

  /** A4 (`00` cell 8 / `01` cells 5,11): period × category pivot with
    * zero fill. `period` = "year", "month", or "quarter" (pandas
    * `to_period('Q')` ≡ `YYYY-Qn`). */
  def pivotByCategory(trxns: DataFrame, period: String = "month"): DataFrame = {
    val p = period match {
      case "year" => year(col("transacted_date")).cast("string")
      case "quarter" => concat(year(col("transacted_date")),
        lit("-Q"), quarter(col("transacted_date")))
      case _ => date_trunc("month", col("transacted_date")).cast("date").cast("string")
    }
    trxns.withColumn("period", p)
      .groupBy("period")
      .pivot("master_category")
      .sum("amount")
      .na.fill(0)
      .orderBy(col("period"))
  }

  /** A5 + W6 (`02` cell 8): cumulative savings — running total over the
    * monthly net. The single-partition window is fine: input is one row
    * per month (≤ hundreds of rows even at 100 TB of raw transactions,
    * because this runs AFTER the monthly aggregate). */
  def cumulativeSavings(trxns: DataFrame,
      excludeCategories: Seq[String] = Seq("Transfers", "Investments"),
      since: String = "2023-10-01"): DataFrame = {
    val monthly = monthlyNetChange(trxns, excludeCategories, since)
    // constant-but-non-foldable partition key (pmod(·,1) = 0, no fold
    // rule): one partition either way over the tiny monthly aggregate,
    // but the "No Partition Defined" warning channel stays reserved for
    // genuinely unbounded windows
    val running = Window
      .partitionBy(coalesce(pmod(year(col("month")), lit(1)), lit(0)))
      .orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly.withColumn("cumulative_savings", sum(col("net_change")).over(running))
  }

  /** Point-in-time balance: for each (account_id, as_of_date) probe, the
    * account's running balance at the latest transaction on-or-before that
    * date. Running balances are one window per account (decimal, exact);
    * the probe lookup is [[graft.operators.AsOfJoin]] — a single shuffle
    * of balances+probes per account, no per-probe scans (the naive
    * formulation re-filters and re-sums the ledger per probe: quadratic).
    * Probes: columns `account_id`, `as_of_date`; transactions need a
    * unique `transaction_id` for the deterministic tiebreak. Accounts
    * with no transaction yet get a null balance. */
  def balanceAsOf(trxns: DataFrame, probes: DataFrame): DataFrame = {
    val perAccount = Window.partitionBy(col("account_id"))
      .orderBy(col("transacted_date").asc, col("transaction_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val balances = trxns.select(
      col("account_id"),
      col("transacted_date"),
      col("transaction_id"),
      sum(col("amount")).over(perAccount).as("balance"))
    graft.operators.AsOfJoin.backward(
      probes, balances,
      keys = Seq("account_id"),
      leftTs = "as_of_date", rightTs = "transacted_date",
      payload = Seq("balance"),
      rightOrder = Seq(col("transaction_id")))
  }
}
