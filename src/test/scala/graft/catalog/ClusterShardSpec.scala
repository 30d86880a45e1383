package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The property x10 exists for, asserted directly on the engine's own
  * output at sf0.001: no near-duplicate pair may straddle the train/eval
  * boundary, and every cluster lands in exactly one shard. (The DuckDB
  * oracle checks the VALUES; this pins the INVARIANT the values encode, so
  * a future edit that keeps the split deterministic but breaks cluster
  * atomicity fails loudly here.) */
class ClusterShardSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("x10: every d5 near-dup pair shares a shard; clusters are shard-atomic") {
    assume(new java.io.File(sf).isDirectory)
    val shards = Catalog.queries("x10_cluster_shard")(spark, sf)
      .select("doc_id", "component_id", "shard").cache()

    val perCluster = shards.groupBy("component_id")
      .agg(countDistinct(col("shard")).as("n_shards"))
    assert(perCluster.filter(col("n_shards") > 1).count() == 0)

    val pairs = Catalog.queries("d5_simhash_neardup_pairs")(spark, sf)
    val straddling = pairs
      .join(shards.select(col("doc_id").as("doc1"), col("shard").as("s1")), "doc1")
      .join(shards.select(col("doc_id").as("doc2"), col("shard").as("s2")), "doc2")
      .filter(col("s1") =!= col("s2"))
    assert(straddling.count() == 0)

    // and the split still covers all docs exactly once
    val docs = graft.io.Tables.documents(spark, sf).count()
    assert(shards.count() == docs)
    shards.unpersist()
    ()
  }
}
