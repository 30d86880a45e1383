package graft.finance.ml

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CategoryClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic labeled set: three categories with distinctive vocabulary. */
  private def labeled(n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val (cat, text, amount) = i % 3 match {
        case 0 => ("Dining", s"starbucks coffee shop visit $i", -5.0 - i % 10)
        case 1 => ("Travel", s"united airlines flight booking $i", -300.0 - i % 50)
        case 2 => ("Income", s"payroll direct deposit employer $i", 2000.0 + i % 100)
      }
      (s"t$i", cat, text, amount)
    }
    rows.toDF("transaction_id", "master_category", "combined_text", "amount_d")
      .withColumn("amount", col("amount_d").cast("decimal(18,2)"))
      .withColumn("is_negative", when(col("amount") < 0, 1).otherwise(0))
      .withColumn("day_of_week", lit(2)).withColumn("day_of_month", lit(15))
      .withColumn("amount_bucket", lit(1))
      .withColumn("has_hotel_keyword", lit(0)).withColumn("has_gas_keyword", lit(0))
      .withColumn("has_grocery_keyword", lit(0))
      .withColumn("has_restaurant_keyword", when(col("master_category") === "Dining", 1).otherwise(0))
      .withColumn("has_transport_keyword", lit(0)).withColumn("has_shop_keyword", lit(0))
      .withColumn("has_flight_keyword", when(col("master_category") === "Travel", 1).otherwise(0))
      .withColumn("has_credit_fee_keyword", lit(0)).withColumn("has_interest_keyword", lit(0))
      .drop("amount_d")
  }

  private val fastCfg = CategoryClassifier.Config(numTrees = 20, maxDepth = 8)

  test("min-sample gate records skipped below 50 rows") {
    CategoryClassifier.train(labeled(30), fastCfg) match {
      case CategoryClassifier.Skipped(reason, n) =>
        assert(reason == "insufficient_data" && n == 30)
      case other => fail(s"expected Skipped, got $other")
    }
  }

  test("stratified split is deterministic and ~80/20 per class") {
    val data = labeled(90)
    val (tr1, te1) = CategoryClassifier.stratifiedSplit(data)
    val (tr2, te2) = CategoryClassifier.stratifiedSplit(data)
    assert(tr1.select("transaction_id").collect().map(_.getString(0)).sorted.toSeq ==
      tr2.select("transaction_id").collect().map(_.getString(0)).sorted.toSeq)
    val perClassTest = te1.groupBy("master_category").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perClassTest.values.forall(c => c == 6)) // 30 per class → 6 test
    assert(tr1.count() + te1.count() == 90 && te2.count() == 18)
  }

  test("trains on separable data, predicts with high accuracy, thresholds UNCERTAIN") {
    CategoryClassifier.train(labeled(120), fastCfg) match {
      case CategoryClassifier.Trained(model, labels, metrics, nTrain, nTest, nClasses) =>
        assert(nClasses == 3 && nTrain + nTest == 120)
        assert(labels.toSeq == Seq("Dining", "Income", "Travel")) // alphabetAsc
        assert(metrics("accuracy") > 0.9, s"accuracy ${metrics("accuracy")}")
        assert(metrics("f1_macro") > 0.9)

        val toScore = Seq(
          ("s1", "starbucks coffee latte", -6.0),
          ("s2", "united airlines flight to boston", -450.0))
          .toDF("transaction_id", "combined_text", "amount_d")
          .withColumn("amount", col("amount_d").cast("decimal(18,2)"))
          .withColumn("is_negative", lit(1)).withColumn("day_of_week", lit(2))
          .withColumn("day_of_month", lit(15)).withColumn("amount_bucket", lit(1))
          .withColumn("has_hotel_keyword", lit(0)).withColumn("has_gas_keyword", lit(0))
          .withColumn("has_grocery_keyword", lit(0))
          .withColumn("has_restaurant_keyword", when(col("transaction_id") === "s1", 1).otherwise(0))
          .withColumn("has_transport_keyword", lit(0)).withColumn("has_shop_keyword", lit(0))
          .withColumn("has_flight_keyword", when(col("transaction_id") === "s2", 1).otherwise(0))
          .withColumn("has_credit_fee_keyword", lit(0)).withColumn("has_interest_keyword", lit(0))

        val scored = CategoryClassifier.score(model, labels, toScore, "vtest")
        val byId = scored.collect().map(r => r.getString(0) ->
          (r.getString(1), r.getDecimal(2).doubleValue())).toMap
        assert(byId("s1")._1 == "Dining", s"got $byId")
        assert(byId("s2")._1 == "Travel")
        assert(byId.values.forall(_._2 > 0.4))

        // impossible threshold → everything UNCERTAIN
        val uncertain = CategoryClassifier.score(model, labels, toScore, "vtest",
          confidenceThreshold = 1.01)
        assert(uncertain.select("predicted_master_category")
          .collect().map(_.getString(0)).forall(_ == "UNCERTAIN"))
      case other => fail(s"expected Trained, got $other")
    }
  }

  test("stratified split: 2-4-row classes still contribute a test row; singletons go to train") {
    val data = labeled(90).limit(0)
      .union(labeled(90).filter(col("master_category") === "Dining").limit(2))
      .union(labeled(90).filter(col("master_category") === "Travel").limit(4))
      .union(labeled(90).filter(col("master_category") === "Income").limit(1))
    val (tr, te) = CategoryClassifier.stratifiedSplit(data)
    val testByClass = te.groupBy("master_category").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(testByClass.get("Dining").contains(1L)) // n=2 → 1 test row
    assert(testByClass.get("Travel").contains(1L)) // n=4 → ceil(3.2)=4 capped at 3 → 1 test
    assert(!testByClass.contains("Income"))        // singleton → all train
    assert(tr.filter(col("master_category") === "Income").count() == 1)
  }

  test("metrics include true macro precision/recall distinct from weighted") {
    CategoryClassifier.train(labeled(120), fastCfg) match {
      case CategoryClassifier.Trained(_, _, metrics, _, _, _) =>
        assert(metrics.contains("precision_macro") && metrics.contains("recall_macro"))
        assert(metrics("precision_macro") > 0.8 && metrics("recall_macro") > 0.8)
      case other => fail(s"expected Trained, got $other")
    }
  }

  test("balanced weights follow n/(k*n_c)") {
    val df = labeled(90).filter(col("master_category") =!= "Income")
      .union(labeled(90).filter(col("master_category") === "Income").limit(10))
    val w = CategoryClassifier.withBalancedWeights(df)
      .select("master_category", "_weight").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // n=70, k=3... actually classes: Dining 30, Travel 30, Income 10 → n=70
    assert(math.abs(w("Income") - 70.0 / (3 * 10)) < 1e-9)
    assert(math.abs(w("Dining") - 70.0 / (3 * 30)) < 1e-9)
  }
}
