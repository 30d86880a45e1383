package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data pipeline (north star):
  * image/audio/video as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schemas, partition-preserving batch iteration,
  * output shapes — is real and tested, and so is IMAGE DECODE: `Codec`
  * parses actual PNG/JPEG/GIF/BMP bytes through the JDK's `javax.imageio`
  * (no external dependency) for true width/height/channels. Payloads
  * ImageIO cannot parse fall back to a deterministic payload-keyed fake so
  * the operators stay total over synthetic corpora (the container has no
  * real image fixtures); a production corpus would route undecodable
  * assets to quarantine instead. The FEATURIZER remains a declared
  * stand-in: a deterministic rolling-hash embedding in place of a vision
  * encoder (the model weights aren't in this container). `mapPartitions`
  * (not a per-row UDF) is deliberate: real codecs amortize model/codec
  * init per partition, exactly like a Pandas-UDF batch would.
  */
object Multimodal {

  /** An opaque media asset: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),   // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source_url", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  final case class DecodedImage(width: Int, height: Int, channels: Int)

  /** Image decode + payload featurization.
    *
    * `decodeImage` is REAL: `javax.imageio.ImageIO` parses the encoded
    * bytes and reports true geometry and the raster's band count (3 for
    * opaque RGB, 4 with alpha, 1 for grayscale). Unparseable payloads get
    * a deterministic fake keyed on the bytes — same total-function
    * contract, synthetic fixtures keep working, and the fallback dims are
    * >= 64 so they cannot be mistaken for a tiny real image. */
  object Codec {
    def decodeImage(payload: Array[Byte]): DecodedImage = {
      val real =
        if (payload == null || payload.isEmpty) None
        else try {
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
            .map(img => DecodedImage(img.getWidth, img.getHeight, img.getRaster.getNumBands))
        } catch { case _: java.io.IOException => None }
      real.getOrElse {
        val h = java.util.Arrays.hashCode(payload)
        DecodedImage(64 + math.abs(h % 1024), 64 + math.abs((h >> 10) % 1024), 3)
      }
    }
    /** Deterministic fixed-dim "embedding" of the payload: a rolling hash
      * folded into `dim` float buckets — stands in for a vision encoder.
      * Null payloads embed as the zero vector (schema allows them; a real
      * codec would likewise need a missing-payload policy). */
    def featurize(payload0: Array[Byte], dim: Int): Array[Float] = {
      val payload = if (payload0 == null) Array.emptyByteArray else payload0
      val acc = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i)
        acc((i % dim + dim) % dim) += (h % 997).toFloat / 997f
        i += 1
      }
      acc
    }
  }

  /** Decode image metadata for every asset — a partition-batched transform
    * producing (asset_id, width, height, channels). Output schema is fixed;
    * partitioning of the input is preserved (no shuffle). */
  def decodeImages(assets: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    assets.select("asset_id", "payload").mapPartitions { rows =>
      // per-partition init happens HERE with a real codec
      rows.map { r =>
        val d = Codec.decodeImage(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), d.width, d.height, d.channels)
      }
    }(enc)
  }

  /** Feature-extract every asset into a fixed-dim float vector column —
    * the shape similarity search consumes (`graft.catalog.SimilarityCatalog`). */
  def featurize(assets: DataFrame, dim: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    assets.select("asset_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(0), Codec.featurize(r.getAs[Array[Byte]]("payload"), dim).toSeq)
      }
    }(enc)
  }

  /** Frame-sample plumbing for video payloads: split the binary into
    * `frameBytes`-sized chunks, keep every `stride`-th — the batch shape a
    * real demuxer would fill in. Pure `functions._`: no UDF, codegen'd. */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 1024, stride: Int = 10): DataFrame =
    assets
      .withColumn("n_frames",
        ceil(length(col("payload")) / lit(frameBytes)).cast("int"))
      // empty payloads have no frames: without this filter the clamp below
      // (which only guards sequence(0,-1)) would emit a phantom frame 0
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx",
        filter(sequence(lit(0), greatest(col("n_frames") - 1, lit(0))),
          i => i % stride === 0))
      .select(col("asset_id"), explode(col("frame_idx")).as("frame_no"),
        substring_index(lit(""), "", 0).as("_dummy"))
      .withColumn("frame_payload_offset", col("frame_no") * frameBytes)
      .drop("_dummy")

  /** Resize plumbing: records the target geometry per asset (the real
    * resample happens in the codec at read time — this is the metadata
    * contract downstream training readers consume). */
  def withResizeTarget(assets: DataFrame, maxEdge: Int): DataFrame =
    decodeImages(assets)
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxEdge, lit(1.0))
          .otherwise(lit(maxEdge) / greatest(col("width"), col("height"))))
      .withColumn("target_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("target_height", ceil(col("height") * col("scale")).cast("int"))
}
