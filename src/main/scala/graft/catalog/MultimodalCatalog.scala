package graft.catalog

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.Tables
import graft.multimodal.{MediaSynth, Multimodal}

/** CORRECTNESS-visible gates for the multimodal stack (round-6 verdict #4 —
  * the last spec-only extension family).
  *
  * Binary codecs are not expressible in DuckDB SQL, so the gate follows the
  * x8 technique: hash-compare a **partition-independent projection whose
  * expected value is pure arithmetic**. Payload parameters (geometry, gray
  * level, sample rate, amplitude, …) are integer functions of `doc_id`;
  * Spark synthesizes REAL container bytes from them on the executors
  * (`multimodal/MediaSynth` — actual PNG / RIFF-WAVE encodings), pushes
  * the bytes through the REAL decode operators
  * (`Multimodal.decodeImages/featurize/decodeAudios/audioFeatures`,
  * `javax.imageio` / `javax.sound.sampled`), and projects the decoded
  * values; DuckDB computes the same integer arithmetic directly. The
  * quantization (`bround(cell*255)`, `bround(window*32768)`) is exact, not
  * approximate — see the MediaSynth scaladoc for the IEEE argument — so a
  * codec regression of even 1 gray level / 1 PCM unit breaks the hash.
  * A fallback-path activation (the payload-keyed fake that keeps the
  * operators total over undecodable bytes) mismatches catastrophically, so
  * "the real decoder actually ran" is itself gated.
  *
  * Scale shape: synth + decode are one fused mapPartitions pass per
  * modality — map-only over the asset scan, no shuffle until the final
  * (tiny) projection; the persist() mirrors the warehouse reality that the
  * encoded corpus is stored once, not re-encoded per consumer.
  */
object MultimodalCatalog {

  private val assetSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Every 8th document carries an asset: present at every fixture scale,
    * bounded fan-in, and the id stride exercises non-contiguous keys. */
  private val AssetFilter = "doc_id % 8 = 0"

  val all: Seq[QueryDef] = Seq(

    // ---- MM1: image decode + pooled-luminance featurize --------------------
    QueryDef(
      "mm1_image_decode",
      "Multimodal image gate: constant-gray PNGs synthesized from doc_id arithmetic (MediaSynth.constantPng), decoded by the real javax.imageio path (Multimodal.decodeImages → true geometry + band count) and featurized by the real pooled-luminance grid (Multimodal.featurize); the oracle predicts every decoded value with integer arithmetic — codec fallback or pooling drift breaks the hash",
      Some(s"""
        SELECT doc_id AS asset_id,
               CAST(16 + doc_id % 48 AS BIGINT) AS width,
               CAST(16 + (doc_id * 7) % 48 AS BIGINT) AS height,
               CAST(3 AS BIGINT) AS channels,
               CAST(doc_id % 256 AS BIGINT) AS lum_q,
               TRUE AS grid_uniform
        FROM documents WHERE $AssetFilter
      """)) { (spark, dir) =>
      val params = Tables.documents(spark, dir)
        .filter(expr(AssetFilter))
        .select(col("doc_id").as("asset_id"),
          (lit(16) + col("doc_id") % 48).cast("int").as("w"),
          (lit(16) + (col("doc_id") * 7) % 48).cast("int").as("h"),
          (col("doc_id") % 256).cast("int").as("gray"))
      // encode ONCE, per partition, with the real PNG writer; persist so the
      // two downstream operators (decode, featurize) read the stored corpus
      // instead of re-encoding — the warehouse shape, and required for a
      // deterministic single materialization
      val assets = params.mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), MediaSynth.constantPng(r.getInt(1), r.getInt(2), r.getInt(3)))
        }
      }(org.apache.spark.sql.Encoders.row(assetSchema)).persist()
      val decoded = Multimodal.decodeImages(assets)
      // 4x4 grid: every cell of a constant image pools to gray/255
      val feats = Multimodal.featurize(assets, dim = 16)
        .select(col("asset_id"),
          bround(element_at(col("embedding"), 1).cast("double") * 255d, 0)
            .cast("long").as("lum_q"),
          (size(array_distinct(transform(col("embedding"),
            e => bround(e.cast("double") * 255d, 0)))) === 1).as("grid_uniform"))
      decoded.join(feats, "asset_id")
        .select(col("asset_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("lum_q"), col("grid_uniform"))
    },

    // ---- MM2: audio decode + windowed-RMS energy ---------------------------
    QueryDef(
      "mm2_audio_decode",
      "Multimodal audio gate: constant-amplitude 16-bit PCM WAVs synthesized from doc_id arithmetic (MediaSynth.constantWav), decoded by the real javax.sound path (Multimodal.decodeAudios → true rate/channels/frames) with the real windowed-RMS profile (Multimodal.audioFeatures); RMS of a constant signal is exactly amp/32768 (IEEE-exact, see MediaSynth), so the oracle predicts energy_q = amp with integer arithmetic",
      Some(s"""
        SELECT doc_id AS asset_id,
               CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS sample_rate_hz,
               CAST(1 + doc_id % 2 AS BIGINT) AS channels,
               CAST(400 + (doc_id % 100) * 8 AS BIGINT) AS frames,
               TRUE AS pcm_ok,
               CAST(500 + (doc_id % 64) * 500 AS BIGINT) AS energy_q,
               TRUE AS windows_uniform
        FROM documents WHERE $AssetFilter
      """)) { (spark, dir) =>
      val params = Tables.documents(spark, dir)
        .filter(expr(AssetFilter))
        .select(col("doc_id").as("asset_id"),
          (lit(8000) + (col("doc_id") % 8) * 1000).cast("int").as("rate"),
          (lit(1) + col("doc_id") % 2).cast("int").as("ch"),
          (lit(400) + (col("doc_id") % 100) * 8).cast("int").as("frames"),
          (lit(500) + (col("doc_id") % 64) * 500).cast("int").as("amp"))
      val assets = params.mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0),
            MediaSynth.constantWav(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
        }
      }(org.apache.spark.sql.Encoders.row(assetSchema)).persist()
      val decoded = Multimodal.decodeAudios(assets)
      val energy = Multimodal.audioFeatures(assets, windows = 4)
        .select(col("asset_id"),
          bround(element_at(col("energy"), 1).cast("double") * 32768d, 0)
            .cast("long").as("energy_q"),
          (size(array_distinct(transform(col("energy"),
            e => bround(e.cast("double") * 32768d, 0)))) === 1).as("windows_uniform"))
      decoded.join(energy, "asset_id")
        .select(col("asset_id"),
          col("sample_rate_hz").cast("long").as("sample_rate_hz"),
          col("channels").cast("long").as("channels"),
          col("frames").as("frames"),
          col("pcm_ok"), col("energy_q"), col("windows_uniform"))
    },

    // ---- MM3: video frame sampling -----------------------------------------
    // The third modality's plumbing (chunk the binary, keep every stride-th
    // frame, byte offsets) is pure arithmetic over the payload length, so
    // the oracle needs no codec at all: payload length is a doc_id formula,
    // DuckDB enumerates the expected (frame_no, offset) pairs with
    // generate_series. Unlike mm1/mm2 the payload content is irrelevant —
    // what's gated is the codegen'd sequence/filter/explode pipeline in
    // Multimodal.sampleFrames (off-by-ones in frame count, stride phase,
    // or offset math all break the hash).
    QueryDef(
      "mm3_frame_sample",
      "Multimodal video gate: frame sampling over synthesized payloads whose byte length is a doc_id formula (512 + (doc_id%7)*300 bytes, 256-byte frames, stride 2); Multimodal.sampleFrames chunks and strides the real binary column, the oracle enumerates the same frames with generate_series — offsets and frame counts gate the whole codegen'd pipeline",
      Some(s"""
        SELECT d.doc_id AS asset_id,
               CAST(g.frame_no AS BIGINT) AS frame_no,
               CAST(g.frame_no * 256 AS BIGINT) AS frame_payload_offset
        FROM (SELECT doc_id,
                     CAST(ceil((512 + (doc_id % 7) * 300) / 256.0) AS BIGINT) AS nf
              FROM documents WHERE $AssetFilter) d,
             LATERAL (SELECT unnest(range(0, CAST(d.nf AS BIGINT), 2)) AS frame_no) g
      """)) { (spark, dir) =>
      val assets = Tables.documents(spark, dir)
        .filter(expr(AssetFilter))
        .select(col("doc_id").as("asset_id"),
          // opaque payload of the formula-determined length; content is
          // irrelevant to the sampler, so a codegen'd repeat() suffices —
          // no mapPartitions, the whole query stays in whole-stage codegen
          expr("cast(repeat('x', cast(512 + doc_id % 7 * 300 as int)) as binary)")
            .as("payload"))
      Multimodal.sampleFrames(assets, frameBytes = 256, stride = 2)
        .select(col("asset_id"),
          col("frame_no").cast("long").as("frame_no"),
          col("frame_payload_offset").cast("long").as("frame_payload_offset"))
    },

    // ---- MM4: image near-dup via signature bucketing ------------------------
    // The d2 posture applied to PIXELS: perceptual-hash dedup of an image
    // corpus. The real pipeline runs end to end — synth PNG bytes, real
    // javax.imageio decode, real pooled-luminance grid (the aHash family),
    // quantized 16-cell signature as the bucket key, bounded-bucket pair
    // expansion (Dedup.boundedDocLists — O(assets), never O(assets²)).
    // Constant-gray fixtures make the signature an INTEGER FUNCTION of
    // doc_id (every cell pools to gray/255, quantization exact), so the
    // oracle reproduces the pair set from doc_id arithmetic alone — while
    // any decode fallback, pooling drift, or quantization error changes a
    // signature and breaks the hash. Bucket cap mirrored in the oracle's
    // HAVING, d2-style.
    QueryDef(
      "mm4_image_neardup",
      "Multimodal image near-dup: real decode + pooled-luminance aHash signatures bucketed for pair expansion (bounded buckets, O(assets)); constant-gray synthesis makes the signature a doc_id formula, so the oracle reproduces the exact pair set arithmetically",
      Some(s"""
        WITH b AS (SELECT doc_id, doc_id % 256 AS lum_q
                   FROM documents WHERE $AssetFilter),
        keep AS (SELECT lum_q FROM b GROUP BY 1
                 HAVING COUNT(*) BETWEEN 2 AND ${graft.operators.Dedup.DefaultMaxBucket})
        SELECT a.doc_id AS asset1, c.doc_id AS asset2, CAST(a.lum_q AS BIGINT) AS lum_q
        FROM b a JOIN keep USING (lum_q)
        JOIN b c ON a.lum_q = c.lum_q AND a.doc_id < c.doc_id
      """)) { (spark, dir) =>
      val params = Tables.documents(spark, dir)
        .filter(expr(AssetFilter))
        .select(col("doc_id").as("asset_id"),
          (lit(16) + col("doc_id") % 48).cast("int").as("w"),
          (lit(16) + (col("doc_id") * 7) % 48).cast("int").as("h"),
          (col("doc_id") % 256).cast("int").as("gray"))
      val assets = params.mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), MediaSynth.constantPng(r.getInt(1), r.getInt(2), r.getInt(3)))
        }
      }(org.apache.spark.sql.Encoders.row(assetSchema)).persist()
      // the full quantized grid is the dedup key — identical gray ⇒
      // identical signature for constant images, but the OPERATOR keys on
      // what the decoder actually produced, not on the synthesis params
      val sig = Multimodal.featurize(assets, dim = 16)
        .select(col("asset_id"),
          array_join(transform(col("embedding"),
            e => bround(e.cast("double") * 255d, 0).cast("long").cast("string")),
            "|").as("sig"))
      val buckets = graft.operators.Dedup.boundedDocLists(
        sig, Seq("sig"), col("asset_id"), graft.operators.Dedup.DefaultMaxBucket)
      buckets.select(
          element_at(split(col("sig"), "\\|"), 1).cast("long").as("lum_q"),
          explode(flatten(
            transform(col("docs"), (x, i) =>
              transform(slice(col("docs"), i + 2, size(col("docs"))),
                y => struct(x.as("asset1"), y.as("asset2")))))).as("p"))
        .select(col("p.asset1").as("asset1"), col("p.asset2").as("asset2"),
          col("lum_q"))
    })
}
