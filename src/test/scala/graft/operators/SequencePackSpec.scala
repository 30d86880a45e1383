package graft.operators

import graft.SparkSpec

/** Guard-rail cases of SequencePack that the property check
  * (SequencePackCheck: exactly-once/budget/determinism over clean input)
  * does not touch: null ids and null token counts must fail loudly with
  * the operator's own message, not as an NPE inside mapPartitions. */
class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  test("a null doc id fails fast with the SequencePack message") {
    val df = Seq(
      (Some(1L), Some(10)), (None, Some(20))
    ).toDF("doc_id", "n_tokens")
    val e = intercept[Exception] {
      SequencePack.pack(df, "doc_id", "n_tokens", budget = 64).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("SequencePack"),
      s"expected the SequencePack null guard, got: ${e.getMessage}")
  }

  test("a null token count fails fast with the SequencePack message") {
    val df = Seq(
      (Some(1L), Some(10)), (Some(2L), None)
    ).toDF("doc_id", "n_tokens")
    val e = intercept[Exception] {
      SequencePack.pack(df, "doc_id", "n_tokens", budget = 64).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("SequencePack"),
      s"expected the SequencePack null guard, got: ${e.getMessage}")
  }

  test("clean rows still pack (guard is inert on the happy path)") {
    val df = Seq((1L, 30), (2L, 30), (3L, 30)).toDF("doc_id", "n_tokens")
    val got = SequencePack.pack(df, "doc_id", "n_tokens", budget = 64)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(got.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(got.forall(_._2 <= 64))
  }

  test("checkInvariants passes a real packing and raises on a corrupted one") {
    val src = Seq((1L, 30), (2L, 30), (3L, 700)).toDF("doc_id", "n_tokens")
    val packed = SequencePack.pack(src, "doc_id", "n_tokens", budget = 64)
    // genuine output (incl. a legitimate single-doc oversize bin): green
    assert(SequencePack.checkInvariants(packed, src, budget = 64)
      .head.getBoolean(0))
    // corrupt the totals: every invariant checker worth shipping must be
    // shown to actually fire
    import org.apache.spark.sql.functions.{col, lit}
    val badTotals = packed.withColumn("bin_tokens", col("bin_tokens") + lit(1))
    val e1 = intercept[Exception] {
      SequencePack.checkInvariants(badTotals, src, budget = 64).collect()
    }
    assert(e1.getMessage.contains("invariant violation"))
    // drop a doc: exactly-once fails
    val missing = packed.filter(col("doc_id") =!= 2L)
    val e2 = intercept[Exception] {
      SequencePack.checkInvariants(missing, src, budget = 64).collect()
    }
    assert(e2.getMessage.contains("bad_docs"))
  }
}
