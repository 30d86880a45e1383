package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class MultimodalSpec extends SparkSpec {

  private def assets = {
    val rows = (0L until 10L).map { i =>
      Row(i, "image", "image/png", Array.fill[Byte](100 + i.toInt * 37)((i % 7).toByte),
        Row(s"s3://bucket/$i.png", null, null, null))
    }
    spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
  }

  test("decodeImages: fixed schema, one row per asset, deterministic") {
    val out = Multimodal.decodeImages(assets)
    assert(out.columns.toSeq == Seq("asset_id", "width", "height", "channels"))
    assert(out.count() == 10)
    val a = out.orderBy("asset_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val b = Multimodal.decodeImages(assets).orderBy("asset_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.toSeq == b.toSeq)
    assert(out.filter(col("width") < 64 || col("height") < 64).count() == 0)
  }

  test("featurize: fixed-dim embedding column, similarity-search compatible") {
    val out = Multimodal.featurize(assets, dim = 16)
    assert(out.schema("embedding").dataType.typeName == "array")
    val sizes = out.select(size(col("embedding"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ == 16))
  }

  test("sampleFrames keeps every stride-th frame with byte offsets") {
    val out = Multimodal.sampleFrames(assets.limit(1), frameBytes = 10, stride = 3)
    val frames = out.select("frame_no", "frame_payload_offset")
      .collect().map(r => r.getInt(0) -> r.getInt(1))
    assert(frames.map(_._1).toSeq == Seq(0, 3, 6, 9)) // 100 bytes / 10 = 10 frames
    assert(frames.forall { case (n, off) => off == n * 10 })
  }

  test("withResizeTarget caps the long edge") {
    val out = Multimodal.withResizeTarget(assets, maxEdge = 128)
    val bad = out.filter(greatest(col("target_width"), col("target_height")) > 128)
    assert(bad.count() == 0)
    // aspect preserved within rounding
    val r = out.head
    val scale = r.getAs[Double]("scale")
    assert(scale <= 1.0)
  }
}
