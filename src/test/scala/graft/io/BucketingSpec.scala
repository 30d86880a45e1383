package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The point of bucketing is the ABSENCE of exchanges: write two tables
  * bucketed on the join key, join them, and assert the physical plan
  * contains no shuffle at all (vs the plain-parquet join, which must
  * exchange at least one side). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join with zero exchanges; plain tables do not") {
    val left = (1L to 500L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 500L).map(k => (k, k * 2.0)).toDF("k", "rv")

    Bucketing.writeBucketed(left, "bk_left", "k", nBuckets = 4)
    Bucketing.writeBucketed(right, "bk_right", "k", nBuckets = 4)
    // disable broadcast: at fixture size the planner would broadcast one
    // side (which also skips the bucketed layout entirely) — the property
    // under test is the big-big case, where co-located buckets are what
    // remove the shuffle
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cogroupJoin(spark, "bk_left", "bk_right", "k")
      assert(joined.count() == 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")

      // control: the same join over non-bucketed inputs DOES exchange
      val plain = left.join(right, Seq("k"))
      plain.count()
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
