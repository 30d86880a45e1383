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
}
