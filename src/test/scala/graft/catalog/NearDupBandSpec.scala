package graft.catalog

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** The banded near-dup machinery behind s3/s7/g6 (round-9 verdict #1:
  * candidates via SRP band buckets + per-bucket cap, never within-label
  * all-pairs), with its contract MEASURED:
  *
  *  - precision is exact: every reported pair really is a same-label pair
  *    with exact cosine >= 0.45 (the verify step recomputes the same
  *    cosine the all-pairs form would);
  *  - recall is the LSH contract, not 100 % — pinned against the exact
  *    all-pairs ground truth on the fixture (deterministic planes, so the
  *    value is stable) and logged;
  *  - the Dedup-style per-bucket cap binds deterministically: an
  *    oversized bucket contributes pairs only among its first
  *    NearDupMaxBucket members by vec_id, so per-bucket work is capped at
  *    cap² and the drop count (members with rn > cap) is observable.
  */
class NearDupBandSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  private def exactPairs = {
    val e = Tables.embeddings(spark, sf)
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.VectorExpressions.dotF(a, b)
    val a = e.select(col("vec_id").as("v1"), col("label"),
      col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("v2"), col("label"),
      col("embedding").as("e2"))
    a.join(b, Seq("label")).filter(col("v1") < col("v2"))
      .select(col("label"), col("v1"), col("v2"),
        (dot(col("e1"), col("e2"))
          / (sqrt(dot(col("e1"), col("e1"))) * sqrt(dot(col("e2"), col("e2")))))
          .as("cos_sim"))
      .filter(col("cos_sim") >= SimilarityCatalog.NearDupThreshold)
  }

  test("s3 pairs are a sound subset of the exact all-pairs ground truth; recall measured") {
    assume(new java.io.File(sf).isDirectory)
    val banded = Catalog.queries("s3_cosine_neardup_pairs")(spark, sf)
    val truth = exactPairs.select(col("v1").as("vec1"), col("v2").as("vec2"))
    val nBanded = banded.count()
    val nTruth = truth.count()
    // soundness: every banded pair is a true pair (exact verify step)
    val unsound = banded.join(truth, Seq("vec1", "vec2"), "left_anti").count()
    assert(unsound == 0, s"$unsound banded pairs not in the exact ground truth")
    assert(nBanded > 0, "banded near-dup output empty on the fixture")
    info(f"banded recall at sf0.01: $nBanded/$nTruth (${nBanded.toDouble / nTruth}%.2f)")
  }

  test("s7 drop list is exactly the v2 side of the banded pairs") {
    assume(new java.io.File(sf).isDirectory)
    val n = Tables.embeddings(spark, sf).count()
    val dropped = Catalog.queries("s3_cosine_neardup_pairs")(spark, sf)
      .select(col("vec2")).distinct().count()
    val kept = Catalog.queries("s7_semantic_prune")(spark, sf).count()
    assert(kept == n - dropped, s"kept=$kept n=$n dropped=$dropped")
  }

  test("per-bucket cap bounds pair generation to the first cap members by vec_id") {
    import spark.implicits._
    val cap = SimilarityCatalog.NearDupMaxBucket
    // 100 identical vectors: one bucket per band, all four bands collide.
    // Pairs must come only from the cap smallest vec_ids; everyone past
    // the cap (the logged drop set) contributes nothing.
    val v = Array.fill(64)(1.0f)
    val e = (1 to 100).map(i => (i.toLong, "cell", v)).toDF("vec_id", "label", "embedding")
    val cand = SimilarityCatalog.bandedCandidatePairs(e)
    assert(cand.count() == cap.toLong * (cap - 1) / 2)
    assert(cand.agg(max(col("v2"))).head.getLong(0) == cap.toLong)
  }
}
