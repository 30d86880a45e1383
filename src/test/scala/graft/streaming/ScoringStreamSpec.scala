package graft.streaming

import graft.SparkSpec
import graft.finance.TableStore
import graft.finance.ml.CategoryClassifier
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ScoringStreamSpec extends SparkSpec {
  import spark.implicits._

  private def pad(df: org.apache.spark.sql.DataFrame) =
    CategoryClassifier.numericalFeatures
      .diff(Seq("amount"))
      .foldLeft(df)((d, c) => d.withColumn(c, lit(0)))

  test("fitted pipeline scores a stream; foreachBatch upserts by key") {
    val train = pad((0 until 60).map { i =>
      val cat = if (i % 2 == 0) "Dining" else "Travel"
      val text = if (i % 2 == 0) s"starbucks coffee $i" else s"united flight $i"
      (s"t$i", cat, text, s"-${i + 1}.00")
    }.toDF("transaction_id", "master_category", "combined_text", "a")
      .withColumn("amount", col("a").cast("decimal(18,2)")))
    val trained = CategoryClassifier.train(train,
      CategoryClassifier.Config(numTrees = 10, maxDepth = 5))
      .asInstanceOf[CategoryClassifier.Trained]

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, String)]
    val stream = pad(input.toDF().toDF("transaction_id", "combined_text", "a")
      .withColumn("amount", col("a").cast("decimal(18,2)")))
    val store = new TableStore(spark, Files.createTempDirectory("graft-stream").toString)

    val scored = ScoringStream.score(trained.model, trained.labels, stream, "v1",
      confidenceThreshold = 0.0)
    val q = ScoringStream.upsertSink(scored, store).start()
    try {
      input.addData(("s1", "starbucks coffee latte", "-4.00"))
      q.processAllAvailable()
      input.addData(("s1", "starbucks coffee latte", "-4.00"), // re-scored → upsert
        ("s2", "united flight to nyc", "-300.00"))
      q.processAllAvailable()
      val out = store.read("predicted_transactions")
        .select("transaction_id", "predicted_master_category")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out.size == 2) // s1 upserted, not duplicated
      assert(out("s1") == "Dining" && out("s2") == "Travel")
    } finally q.stop()
  }
}
