package graft.finance

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JsonColumnsSpec extends SparkSpec {
  import spark.implicits._

  test("registry metrics round-trip through JSON string storage") {
    val reg = Seq(("v1", """{"accuracy":0.91,"f1_macro":0.88}"""))
      .toDF("model_version", "metrics_json")
    val parsed = JsonColumns.withParsedMetrics(reg)
      .select(col("metrics")("accuracy"), col("metrics")("f1_macro")).head
    assert(parsed.getDouble(0) == 0.91 && parsed.getDouble(1) == 0.88)
    val one = JsonColumns.metric(reg, "accuracy").head
    assert(one.getString(0) == "v1" && one.getDouble(1) == 0.91)
  }

  test("extra spillover parses to a string map; malformed yields null") {
    val df = Seq(
      ("t1", """{"payee":"ACME","memo":"x"}"""),
      ("t2", "not json"),
      ("t3", null)).toDF("transaction_id", "extra")
    val out = df.select(col("transaction_id"), JsonColumns.extraMap(col("extra")).as("m"))
      .collect().map(r => r.getString(0) -> Option(r.getMap[String, String](1))).toMap
    assert(out("t1").exists(_("payee") == "ACME"))
    assert(out("t2").isEmpty && out("t3").isEmpty)
  }
}
