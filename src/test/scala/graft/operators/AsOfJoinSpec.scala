package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of picks the latest right row at-or-before each left ts") {
    val quotes = Seq(
      ("A", ts("2024-01-01 09:00:00"), 10.0),
      ("A", ts("2024-01-01 10:00:00"), 11.0),
      ("A", ts("2024-01-01 11:00:00"), 12.0),
      ("B", ts("2024-01-01 09:30:00"), 100.0)
    ).toDF("sym", "qts", "price")
    val trades = Seq(
      (1L, "A", ts("2024-01-01 09:30:00")),  // between 9 and 10 -> 10.0
      (2L, "A", ts("2024-01-01 10:00:00")),  // exactly at 10    -> 11.0 (<=)
      (3L, "A", ts("2024-01-01 12:00:00")),  // after all        -> 12.0
      (4L, "B", ts("2024-01-01 09:00:00")),  // before any       -> null
      (5L, "C", ts("2024-01-01 09:00:00"))   // key absent       -> null
    ).toDF("trade_id", "sym", "tts")

    val out = AsOfJoin.backward(trades, quotes,
        keys = Seq("sym"), leftTs = "tts", rightTs = "qts",
        payload = Seq("qts", "price"))
      .select("trade_id", "price")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(out == Map(
      1L -> Some(10.0), 2L -> Some(11.0), 3L -> Some(12.0),
      4L -> None, 5L -> None))
  }

  test("all left rows and columns survive; struct carry keeps fields consistent") {
    val right = Seq(
      ("A", ts("2024-01-01 09:00:00"), Option.empty[Double], "first"),
      ("A", ts("2024-01-01 10:00:00"), Some(2.0), "second")
    ).toDF("k", "rts", "v", "label")
    val left = Seq(
      ("A", ts("2024-01-01 09:30:00"), 7),
      ("A", ts("2024-01-01 10:30:00"), 8)
    ).toDF("k", "lts", "extra")

    val rows = AsOfJoin.backward(left, right,
        keys = Seq("k"), leftTs = "lts", rightTs = "rts",
        payload = Seq("v", "label"))
      .orderBy("lts")
      .collect()
    assert(rows.length == 2)
    // 09:30 matches the 09:00 row: v is genuinely null there, label 'first' —
    // a per-column last(ignoreNulls) would have mixed rows (no v yet).
    assert(rows(0).isNullAt(rows(0).fieldIndex("v")))
    assert(rows(0).getAs[String]("label") == "first")
    assert(rows(0).getAs[Int]("extra") == 7)
    assert(rows(1).getAs[Double]("v") == 2.0)
    assert(rows(1).getAs[String]("label") == "second")
  }

  test("right-side ties on (key, ts) break deterministically via rightOrder") {
    val right = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1L, "one"),
      ("A", ts("2024-01-01 09:00:00"), 2L, "two")
    ).toDF("k", "rts", "rid", "label")
    val left = Seq(("A", ts("2024-01-01 09:30:00"))).toDF("k", "lts")
    val out = AsOfJoin.backward(left, right,
        keys = Seq("k"), leftTs = "lts", rightTs = "rts",
        payload = Seq("label"), rightOrder = Seq(col("rid")))
      .head.getAs[String]("label")
    // ascending rid: the LAST row in frame order is rid=2
    assert(out == "two")
  }

  test("nearest rejects mismatched left/right timestamp types up front") {
    // advisor round-4 finding: the distance converter was derived from the
    // LEFT timestamp type and applied to both sides — a TIMESTAMP left vs
    // numeric right silently computed the right-side distance wrongly.
    val left = Seq(("A", ts("2024-01-01 09:30:00"))).toDF("k", "lts")
    val right = Seq(("A", 100L, 1.0)).toDF("k", "rts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.nearest(left, right,
        keys = Seq("k"), leftTs = "lts", rightTs = "rts", payload = Seq("v"))
    }
    assert(e.getMessage.contains("matching timestamp types"))
  }

  test("nearest still works when both sides share the timestamp type") {
    val right = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1.0),
      ("A", ts("2024-01-01 10:00:00"), 2.0)
    ).toDF("k", "rts", "v")
    val left = Seq(
      ("A", ts("2024-01-01 09:10:00")),   // closer to 09:00 -> 1.0
      ("A", ts("2024-01-01 09:50:00"))    // closer to 10:00 -> 2.0
    ).toDF("k", "lts")
    val out = AsOfJoin.nearest(left, right,
        keys = Seq("k"), leftTs = "lts", rightTs = "rts", payload = Seq("v"))
      .select("lts", "v").collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
    assert(out == Map(
      ts("2024-01-01 09:10:00") -> 1.0,
      ts("2024-01-01 09:50:00") -> 2.0))
  }
}
