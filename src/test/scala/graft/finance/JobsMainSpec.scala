package graft.finance

import graft.SparkSpec
import org.apache.spark.sql.Row
import java.nio.file.Files
import scala.jdk.CollectionConverters._

class JobsMainSpec extends SparkSpec {

  test("job-name dispatch: transform-only job materializes the DAG; unknown job rejected") {
    val wh = Files.createTempDirectory("graft-jm").toString
    val store = new TableStore(spark, wh)
    val raws = (0 until 5).map { i =>
      Row(s"t$i", "a1", "Checking", "dom", "Bank",
        new java.math.BigDecimal("-5.00"), 1700000000L + i, "2024-01-01",
        1700000000L + i, "2024-01-01", s"coffee $i", false, null,
        "2024-01-02 00:00:00", "2024-01-02")
    }
    store.overwrite("raw_simplefin",
      spark.createDataFrame(raws.asJava, Schemas.simplefinRaw))

    JobsMain.run(spark, wh, "3_run_all_dbt_models")
    assert(store.exists("int_trxns_features"))
    assert(store.exists("fct_trxns_with_predictions"))
    assert(store.read("fct_trxns_uncategorized").count() == 5)

    // full-refresh variant also runs over the same warehouse
    JobsMain.run(spark, wh, "z_b_full_refresh_validated_trxns")
    assert(store.exists("fct_validated_trxns"))

    intercept[IllegalArgumentException] {
      JobsMain.run(spark, wh, "no_such_job")
    }
  }

  test("all 7 reference job names launch end-to-end over one warehouse") {
    val wh = Files.createTempDirectory("graft-jm7").toString
    val store = new TableStore(spark, wh)
    val raws = (0 until 8).map { i =>
      Row(s"t$i", "a1", "Checking", "dom", "Bank",
        new java.math.BigDecimal("-5.00"), 1700000000L + i, "2024-01-01",
        1700000000L + i, "2024-01-01", s"coffee $i", false, null,
        "2024-01-02 00:00:00", "2024-01-02")
    }
    store.overwrite("raw_simplefin",
      spark.createDataFrame(raws.asJava, Schemas.simplefinRaw))

    // the reference's job menu, in its dagster/repo.py:88-170 order; with
    // under-50-sample data the train step reports Skipped and the predict
    // step degrades to no-model — the COMPOSITION must still run through
    val jobNames = Seq(
      "1_dagster_init",
      "2_ingest_and_predict",
      "3_run_all_dbt_models",
      "4_refresh_validated_retrain_repredict",
      "z_a_rebuild_historic_data",
      "z_b_full_refresh_validated_trxns",
      "5_full_refresh_validated_retrain_repredict")
    jobNames.foreach { name => JobsMain.run(spark, wh, name) }

    // every downstream mart the DAG owns exists after the sweep
    Seq("int_trxns_features", "fct_trxns_categorized",
      "fct_trxns_uncategorized", "fct_trxns_with_predictions",
      "fct_validated_trxns").foreach { t =>
      assert(store.exists(t), s"table $t missing after 7-job sweep")
    }
    assert(store.read("fct_trxns_with_predictions").count() == 8)
  }
}
