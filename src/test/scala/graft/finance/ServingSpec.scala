package graft.finance

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ServingSpec extends SparkSpec {
  import spark.implicits._

  /** (id, date, description, predicted, confidence, validated-or-null) */
  private def fixture: DataFrame = {
    val preds = Seq(
      ("t1", "2024-01-05", "coffee", Some("Dining"), Some(0.95), None),
      ("t2", "2024-01-03", "mystery", None, None, None),
      ("t3", "2024-01-04", "uncertain thing", Some("UNCERTAIN"), Some(0.2), None),
      ("t4", "2024-01-01", "validated thing", Some("Travel"), Some(0.7), Some(true)),
      ("t5", "2024-01-02", "low conf", Some("Dining"), Some(0.15), None))
      .toDF("transaction_id", "d", "description", "pmc", "conf", "validated")
      .select(
        col("transaction_id"),
        col("d").cast("date").as("transacted_date"),
        col("description"),
        col("pmc").as("predicted_master_category"),
        col("conf").cast("decimal(6,4)").as("prediction_confidence"),
        col("validated"))
    val uc = preds.filter(col("validated").isNotNull)
      .select(col("transaction_id"), col("validated"),
        lit("Travel").as("master_category"), lit(null).cast("string").as("notes"))
    Serving.servingJoin(preds.drop("validated"), uc)
  }

  test("view modes partition the rows as the reference's three filters") {
    val j = fixture
    def ids(m: Serving.ViewMode) =
      j.filter(Serving.viewModePredicate(m)).select("transaction_id")
        .collect().map(_.getString(0)).toSet
    assert(ids(Serving.UnvalidatedPredicted) == Set("t1", "t5"))
    assert(ids(Serving.UnvalidatedUnpredicted) == Set("t2", "t3"))
    assert(ids(Serving.Validated) == Set("t4"))
    assert(ids(Serving.AllTransactions).size == 5)
  }

  test("confidence gate drops low-confidence rows only in predicted mode") {
    val page = Serving.transactionPage(fixture,
      mode = Serving.UnvalidatedPredicted,
      excludeLowConfidence = true, lowConfidenceThreshold = 0.40)
    assert(page.rows.select("transaction_id").collect().map(_.getString(0)).toSeq == Seq("t1"))
    assert(page.totalCount == 1)
  }

  test("pagination: sorted desc nulls-last with count twin") {
    val page = Serving.transactionPage(fixture, limit = 2, offset = 1)
    assert(page.totalCount == 5)
    val got = page.rows.select("transaction_id").collect().map(_.getString(0)).toSeq
    assert(got == Seq("t3", "t2")) // dates desc: t1(05) t3(04) t2(03) t5(02) t4(01)
  }

  test("ascending sort puts nulls last (PG ASC NULLS LAST, not Spark default)") {
    val j = fixture
    val page = Serving.transactionPage(j,
      sortBy = "prediction_confidence", ascending = true, limit = 10)
    val got = page.rows.select("transaction_id").collect().map(_.getString(0)).toSeq
    assert(got == Seq("t5", "t3", "t4", "t1", "t2")) // t2 (null conf) LAST
  }

  test("search filters case-insensitively on description substring") {
    val page = Serving.transactionPage(fixture, descriptionSearch = Some("COFFEE"))
    assert(page.rows.select("transaction_id").collect().map(_.getString(0)).toSeq == Seq("t1"))
  }

  test("validatedTransactionPage: category/account filters, own whitelist, count twin") {
    val v = Seq(
      ("t1", "2024-01-05", "Dining", "Junior Checking", "starbucks"),
      ("t2", "2024-01-03", "Dining", "Blue Cash", "pizza"),
      ("t3", "2024-01-04", "Travel", "Junior Checking", "flight"))
      .toDF("transaction_id", "d", "master_category", "account_name", "description")
      .select(col("transaction_id"), col("d").cast("date").as("transacted_date"),
        col("master_category"), col("account_name"), col("description"))
    val p1 = Serving.validatedTransactionPage(v, category = Some("Dining"))
    assert(p1.totalCount == 2)
    assert(p1.rows.select("transaction_id").collect().map(_.getString(0)).toSeq == Seq("t1", "t2"))
    val p2 = Serving.validatedTransactionPage(v,
      accountNameFilter = Some("junior"), sortBy = "account_name", ascending = true)
    assert(p2.totalCount == 2)
    // non-whitelisted sort falls back to transacted_date
    val p3 = Serving.validatedTransactionPage(v, sortBy = "evil; DROP TABLE")
    assert(p3.rows.select("transaction_id").head.getString(0) == "t1")
  }

  test("inUseCategories unions the four pipeline sources, excluding UNCERTAIN") {
    val uc = Seq(("t1", Some("Rent"))).toDF("transaction_id", "master_category")
    val cat = Seq(("t2", Some("Dining"))).toDF("transaction_id", "master_category")
    val wp = Seq(
      ("t3", Some("Salary"), Some("Dining")),
      ("t4", None: Option[String], Some("UNCERTAIN")))
      .toDF("transaction_id", "master_category", "predicted_master_category")
    val got = Serving.inUseCategories(uc, cat, wp).collect().map(_.getString(0)).toSeq
    assert(got == Seq("Dining", "Rent", "Salary"))
  }

  test("distinctCategories unions user + confident predicted, sorted") {
    val got = Serving.distinctCategories(fixture)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("Dining", "Travel")) // UNCERTAIN excluded
  }

  test("keyset pages stitch into the full sorted list without gaps or repeats") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // amounts collide on purpose: the cursor must disambiguate via the id
    val rows = (1 to 57).map(i => (s"t%03d".format(i), (i % 7) * 10.0)).toDF("transaction_id", "amt")
    val expected = rows.orderBy($"amt".asc, $"transaction_id".asc)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

    var cursor: Option[(String, Double)] = None
    val stitched = Iterator.continually {
      val page = Serving.keysetPage(rows, sortBy = "amt",
          after = cursor.map { case (id, amt) => (Some(lit(amt)), lit(id)) }, limit = 10)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      cursor = page.lastOption.map { case (id, amt) => (id, amt) }
      page
    }.takeWhile(_.nonEmpty).flatten.toSeq

    assert(stitched == expected)
  }

  test("keyset pages stitch DESC NULLS LAST with nullable sort keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // ids 1..57; every 5th amount is null — the cursor must cross from the
    // descending non-null region into the null tail and keep paging by id
    val rows = (1 to 57)
      .map(i => (s"t%03d".format(i), if (i % 5 == 0) None else Some((i % 7) * 10.0)))
      .toDF("transaction_id", "amt")
    val expected = rows.orderBy($"amt".desc_nulls_last, $"transaction_id".asc)
      .collect().map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]))).toSeq

    var cursor: Option[(String, Option[Double])] = None
    val stitched = Iterator.continually {
      val page = Serving.keysetPage(rows, sortBy = "amt",
          after = cursor.map { case (id, amt) =>
            (amt.map(lit(_)), lit(id))
          }, limit = 10, ascending = false)
        .collect().map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]))).toSeq
      cursor = page.lastOption
      page
    }.takeWhile(_.nonEmpty).flatten.toSeq

    assert(stitched == expected)
  }

  test("keysetPage rejects non-positive limits") {
    intercept[IllegalArgumentException] {
      Serving.keysetPage(fixture, sortBy = "amount", limit = 0)
    }
    ()
  }
}
