package graft.multimodal

import graft.SparkSpec
import graft.operators.AnnIndex
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** End-to-end training-data-pipeline slice: binary media assets →
  * deterministic featurization → IVF index → top-k similarity search.
  * Exercises the contract between the multimodal embedding column and the
  * ANN operators (same `array<float>` shape as the embeddings fixture). */
class MultimodalAnnIntegrationSpec extends SparkSpec {

  test("featurized media assets flow into the ANN index and search") {
    // near-duplicate payload pairs: i and i+100 share payload prefix bytes
    val rows = (0L until 60L).map { i =>
      val base = (i % 30).toInt
      val payload = Array.tabulate[Byte](256)(j => ((base * 31 + j) % 127).toByte)
      Row(i, "image", "image/png", payload, Row(s"u$i", null, null, null))
    }
    val assets = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)

    val embedded = Multimodal.featurize(assets, dim = 32)
      .withColumnRenamed("asset_id", "vec_id")
    val idx = AnnIndex.build(embedded, "embedding", nCells = 4, seed = 1L)
    val queries = embedded.filter(col("vec_id") < 4)
    val hits = AnnIndex.searchTopK(idx, queries, "vec_id", "embedding", k = 1, nProbe = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // identical payloads (i and i+30 share base) embed identically →
    // the nearest neighbor of asset q must be its twin q+30
    (0L until 4L).foreach { q => assert(hits(q) == q + 30, s"query $q got ${hits(q)}") }
  }
}
