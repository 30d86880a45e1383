package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** d14's reason to exist, demonstrated: a 50-token span copied between two
  * documents at MISALIGNED offsets straddles every one of d11's fixed
  * 10-token chunk boundaries (the copy starts at offset 5 in one doc and
  * offset 3 in the other — shift 2, never a multiple of the chunk length),
  * so d11 shares no chunk and keeps both copies intact, while d14's
  * stride-1 windows catch the span exactly and erase the later occurrence.
  * The fixture is written as a real documents.parquet so both entries run
  * through their production path (Tables.documentsFanned).
  */
class ExactSubstrSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-exactsubstr").toString
    val span = (0 until 50).map(i => s"a${i + 3}") // doc1 tokens 4..53 (1-based)
    val doc1 = (0 until 100).map(i => s"a$i").mkString(" ")
    val doc2 = ((0 until 5).map(i => s"b$i") ++ span ++
      (0 until 15).map(i => s"c$i")).mkString(" ")
    import spark.implicits._
    Seq((1L, doc1), (2L, doc2))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("spec").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("d11's aligned chunks miss the straddling span") {
    val d11 = Catalog.queries("d11_span_dedup")(spark, dir)
      .select(col("doc_id"), col("dedup_text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // both documents survive UNCHANGED: no 10-token chunk is shared, so the
    // copied 50 tokens are still inside doc 2's rebuilt text
    assert(d11(1L).split(" ").length == 100)
    assert(d11(2L).split(" ").length == 70,
      s"d11 was expected to MISS the misaligned span but removed tokens: ${d11(2L)}")
    assert(d11(2L).contains("a3"), "d11 unexpectedly caught the straddling span")
  }

  test("d14's stride-1 windows catch it and erase exactly the later copy") {
    val d14 = Catalog.queries("d14_exact_substring_dedup")(spark, dir)
      .select(col("doc_id"), col("n_toks"), col("n_kept"), col("n_removed"),
        col("dedup_text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // first occurrence (doc 1) keeps all 100 tokens
    assert(d14(1L).getLong(1) == 100 && d14(1L).getLong(3) == 0)
    // later occurrence loses exactly the 50 copied tokens, nothing else
    assert(d14(2L).getLong(1) == 70, "doc 2 token count")
    assert(d14(2L).getLong(3) == 50,
      s"expected exactly the 50-token span erased, got n_removed=${d14(2L).getLong(3)}")
    val rebuilt = d14(2L).getString(4)
    assert(rebuilt == ((0 until 5).map(i => s"b$i") ++
      (0 until 15).map(i => s"c$i")).mkString(" "),
      s"doc 2 rebuilt text wrong: $rebuilt")
  }

  test("periodic text erases back into the first occurrence (documented self-overlap contract)") {
    // A document of one token repeated 120 times: every 50-token window has
    // the same hash, so windows at pos 2..71 are "later occurrences" of the
    // pos-1 window and erase positions 2..120 — the first occurrence itself
    // survives only as its first token. This is deliberately MORE aggressive
    // than Lee et al.'s span semantics on self-overlapping repeats (the d14
    // entry comment states the contract); this test pins it so a rewrite
    // that silently changes the rule fails here instead of in the oracle.
    val d = java.nio.file.Files.createTempDirectory("graft-periodic").toString
    import spark.implicits._
    Seq((1L, Seq.fill(120)("w").mkString(" ")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("spec").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = Catalog.queries("d14_exact_substring_dedup")(spark, d)
      .select(col("n_toks"), col("n_kept"), col("n_removed"), col("dedup_text"))
      .collect().head
    assert(r.getLong(0) == 120 && r.getLong(1) == 1 && r.getLong(2) == 119,
      s"periodic-text erase contract changed: $r")
    assert(r.getString(3) == "w")
  }
}
