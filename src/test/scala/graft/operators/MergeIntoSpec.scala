package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Every arm of the MERGE matrix on a 5-row crafted state where each row
  * exercises exactly one arm; plus the degenerate defaults and the
  * schema/key guards. */
class MergeIntoSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  // target keys: 1 (update), 2 (matched delete), 3 (stale keep), 4 (stale
  // delete); source keys: 1, 2 (cancel), 5 (insert)
  private def target: DataFrame = {
    import spark.implicits._
    Seq((1L, "old", 10.0), (2L, "old", 20.0), (3L, "old", 30.0),
      (4L, "old", 40.0)).toDF("k", "status", "v")
  }
  private def source: DataFrame = {
    import spark.implicits._
    Seq((1L, "upd", 11.0), (2L, "cancel", 0.0), (5L, "new", 50.0))
      .toDF("k", "status", "v")
  }

  private def run(): Map[Long, (String, Double)] =
    MergeInto(target, source, Seq("k"),
      matchedDelete = col("s_status") === "cancel",
      matchedUpdate = Map("status" -> col("s_status"), "v" -> col("s_v")),
      staleDelete = col("k") === 4L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("all five arms resolve correctly in one pass") {
    val out = run()
    assert(out.keySet == Set(1L, 3L, 5L)) // 2 cancel-deleted, 4 stale-deleted
    assert(out(1L) == ("upd", 11.0))      // matched → updated from source
    assert(out(3L) == ("old", 30.0))      // not matched by source → unchanged
    assert(out(5L) == ("new", 50.0))      // source-only → inserted
  }

  test("defaults degenerate to plain upsert semantics") {
    // no deletes, no update map → matched rows keep TARGET values (empty
    // SET list), inserts still happen
    val out = MergeInto(target, source, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out(1L) == "old" && out(5L) == "new")
  }

  test("schema mismatch and non-value update columns are rejected") {
    import spark.implicits._
    val bad = Seq((1L, "x")).toDF("k", "status")
    intercept[IllegalArgumentException] { MergeInto(target, bad, Seq("k")) }
    intercept[IllegalArgumentException] {
      MergeInto(target, source, Seq("k"), matchedUpdate = Map("k" -> lit(9L)))
    }
  }

  test("duplicate source matches raise the ANSI cardinality violation") {
    import spark.implicits._
    val dupSource = Seq((1L, "upd", 11.0), (1L, "upd2", 12.0), (5L, "new", 50.0))
      .toDF("k", "status", "v")
    val e = intercept[Exception] {
      MergeInto(target, dupSource, Seq("k")).collect()
    }
    assert(e.getMessage.contains("cardinality") ||
      Option(e.getCause).exists(_.getMessage.contains("cardinality")))
    // duplicates on an UNMATCHED source key are also a violation per ANSI?
    // No — they match no target row, both insert; only matched dups raise.
    val unmatchedDup = Seq((5L, "a", 1.0), (5L, "b", 2.0)).toDF("k", "status", "v")
    assert(MergeInto(target, unmatchedDup, Seq("k")).count() == 6L)
    // opting out restores the documented join fan-out for pre-deduped callers
    assert(MergeInto(target, dupSource, Seq("k"),
      failOnMultipleSourceMatches = false).count() == 6L)
  }

  test("update expressions may mix both sides of the joined schema") {
    val out = MergeInto(target, source, Seq("k"),
      matchedUpdate = Map("v" -> (col("v") + col("s_v"))))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) == 21.0) // 10 + 11: old value + batch value
    assert(out(3L) == 30.0)
  }
}
