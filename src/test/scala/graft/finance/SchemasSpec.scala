package graft.finance

import graft.SparkSpec
import java.nio.file.Files

/** S4: the CSV seed ingestion path, exercised with real CSV files written
  * to a temp dir (the shared fixtures carry no CSVs — this closes that
  * gap with round-trip evidence instead of createDataFrame stand-ins). */
class SchemasSpec extends SparkSpec {

  private val tempDirs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  override def afterAll(): Unit = {
    tempDirs.foreach(d => graft.finance.ops.FileTrees.delete(d))
    super.afterAll()
  }

  private def writeTemp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-seed")
    tempDirs += dir
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("exclusion seed round-trips through its declared schema") {
    val path = writeTemp("seed_transaction_exclusions.csv",
      """pattern
        |%Credit Card Payment%
        |%INTERNAL TRANSFER%
        |""".stripMargin)
    val df = Schemas.readSeedCsv(spark, path, Schemas.transactionExclusions)
    assert(df.schema == Schemas.transactionExclusions)
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("%Credit Card Payment%", "%INTERNAL TRANSFER%"))
  }

  test("historic seed round-trips: all-text raw layer, quoted commas intact") {
    val path = writeTemp("historic_transactions_example.csv",
      """account_name,additional_account_detail,amount,transaction_date,description,source_category,master_category,input_date
        |Checking,,-42.50,2023-01-15,"Coffee, beans and more",Dining,Food,01/20/2023
        |Savings,sub1,100.00,2023-02-01,Deposit,,Income,02/05/2023
        |""".stripMargin)
    val df = Schemas.readSeedCsv(spark, path, Schemas.historicRaw)
    assert(df.schema == Schemas.historicRaw)
    val rows = df.orderBy("transaction_date").collect()
    assert(rows.length == 2)
    // raw layer keeps amount as TEXT (feeds the MD5 surrogate key) and the
    // quoted comma survives
    assert(rows(0).getAs[String]("amount") == "-42.50")
    assert(rows(0).getAs[String]("description") == "Coffee, beans and more")
    assert(rows(1).getAs[String]("additional_account_detail") == "sub1")
  }

  test("rebuildSeeds refreshes exactly the seed tables whose CSVs exist") {
    val seedDir = Files.createTempDirectory("graft-seeds")
    tempDirs += seedDir
    Files.writeString(seedDir.resolve("seed_transaction_exclusions.csv"),
      "pattern\n%TRANSFER%\n")
    Files.writeString(seedDir.resolve("seed_account_mapping_simplefin.csv"),
      "account_name,account_id,mapped_account_name\nChk (1234),,Checking\n")
    val whDir = Files.createTempDirectory("graft-wh-seeds")
    tempDirs += whDir
    val store = new TableStore(spark, whDir.toString)
    val jobs = new Jobs(spark, store)

    val refreshed = jobs.rebuildSeeds(seedDir.toString)
    assert(refreshed.sorted ==
      Seq("seed_account_mapping_simplefin", "seed_transaction_exclusions"))
    assert(store.read("seed_transaction_exclusions")
      .collect().map(_.getString(0)).toSeq == Seq("%TRANSFER%"))
    assert(store.read("seed_account_mapping_simplefin")
      .head.getAs[String]("mapped_account_name") == "Checking")
    assert(!store.exists("historic_transactions")) // no CSV → untouched
  }

  test("a malformed seed row fails fast instead of nulling silently") {
    // 3 fields against the 8-column historic schema: FAILFAST must raise,
    // PERMISSIVE (the default) would have nulled five columns silently
    val path = writeTemp("bad.csv",
      """account_name,additional_account_detail,amount,transaction_date,description,source_category,master_category,input_date
        |Checking,sub1,-42.50
        |""".stripMargin)
    intercept[Exception] {
      Schemas.readSeedCsv(spark, path, Schemas.historicRaw).collect()
    }
    ()
  }
}
