package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  // deterministic "random" keys: splitmix64 over a counter
  private def keys(n: Int, salt: Long): Seq[Long] =
    (0 until n).map(i => BloomBits.mix64(i * 2654435761L + salt))

  test("BloomBits: no false negatives, direct") {
    val filter = new Array[Byte](1 + 1024)
    filter(0) = 5
    val ks = keys(500, 7L)
    ks.foreach(BloomBits.set(filter, _))
    assert(ks.forall(BloomBits.mightContain(filter, _)))
  }

  test("BloomBits: measured false-positive rate stays near theory") {
    // 2^17 bits, k=5, 1000 keys → theoretical fpp ≈ (1-e^(-kn/m))^k ≈ 2e-7;
    // assert a loose 1% so the test is insensitive to hash luck
    val filter = new Array[Byte](1 + (1 << 14))
    filter(0) = 5
    keys(1000, 1L).foreach(BloomBits.set(filter, _))
    val probes = keys(20000, 999L) // disjoint salt → effectively non-members
    val fp = probes.count(BloomBits.mightContain(filter, _))
    assert(fp < 200, s"false-positive rate too high: $fp / 20000")
  }

  test("aggregate: build over partitioned data is byte-identical to 1 partition") {
    val ks = keys(2000, 42L)
    def build(parts: Int): Array[Byte] =
      ks.toDF("k").repartition(parts)
        .agg(BloomBits.bloomBuild(col("k"), numBits = 1 << 16, numHashes = 7))
        .head.getAs[Array[Byte]](0)
    val one = build(1)
    val many = build(13)
    assert(one.sameElements(many))
    assert((one(0) & 0xFF) == 7, "header must carry numHashes")
    assert(one.length == 1 + (1 << 16) / 8)
  }

  test("aggregate + codegen probe: exact round trip through a DataFrame filter") {
    val members = keys(1500, 3L)
    val filter = members.toDF("k")
      .agg(BloomBits.bloomBuild(col("k"))).head.getAs[Array[Byte]](0)
    // every member passes the probe inside a whole-stage-codegen'd filter
    val survivors = members.toDF("k")
      .filter(BloomBits.bloomMightContain(lit(filter), col("k")))
      .count()
    assert(survivors == members.size)
  }

  test("aggregate skips null keys; empty group yields an all-zero filter") {
    val filter = Seq[Option[Long]](None, None).toDF("k")
      .agg(BloomBits.bloomBuild(col("k"), numBits = 64, numHashes = 2))
      .head.getAs[Array[Byte]](0)
    assert(filter.drop(1).forall(_ == 0))
    assert(!BloomBits.mightContain(filter, 123L))
  }

  test("merge refuses mismatched geometry") {
    val a = BloomBuildAgg(org.apache.spark.sql.catalyst.expressions.Literal(1L), 64, 2)
    val bufA = a.createAggregationBuffer()
    val bufB = new Array[Byte](1 + 16); bufB(0) = 3
    val e = intercept[IllegalArgumentException](a.merge(bufA, bufB))
    assert(e.getMessage.contains("geometry"))
  }

  test("SQL registration: bloom_build + bloom_might_contain") {
    val ext = spark.sessionState.functionRegistry
    GraftExtensions.bloomBuild match { case (id, inf, b) =>
      ext.registerFunction(id, inf, b) }
    GraftExtensions.bloomMightContain match { case (id, inf, b) =>
      ext.registerFunction(id, inf, b) }
    keys(100, 5L).toDF("k").createOrReplaceTempView("bloom_keys")
    val n = spark.sql("""
      WITH f AS (SELECT bloom_build(k, 65536, 4) AS bf FROM bloom_keys)
      SELECT count(*) AS n FROM bloom_keys, f WHERE bloom_might_contain(bf, k)
    """).head.getLong(0)
    assert(n == 100)
  }
}
