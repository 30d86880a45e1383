package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The audio half of the codec: REAL WAV bytes synthesized in-test through
  * the same JDK audio stack the codec decodes with (no fixture files), plus
  * the fallback contract for undecodable payloads. */
class AudioSpec extends SparkSpec {

  /** A mono 16-bit PCM WAV: `seconds` of samples from `gen(frameIdx)` in
    * [-1, 1], encoded through javax.sound — a genuine RIFF container. */
  private def wavBytes(sampleRate: Int, seconds: Double, gen: Int => Double): Array[Byte] = {
    val n = (sampleRate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = math.max(-1.0, math.min(1.0, gen(i)))
      val v = (s * 32767).toInt.toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudio reads true sample rate, channels, and frame count from WAV") {
    val d = Multimodal.Codec.decodeAudio(wavBytes(16000, 0.5, _ => 0.0))
    assert(d.pcmOk)
    assert(d.sampleRateHz == 16000 && d.channels == 1 && d.frames == 8000)
  }

  test("decodeAudio falls back deterministically on non-audio payloads") {
    val junk = Array.fill[Byte](257)(7)
    val a = Multimodal.Codec.decodeAudio(junk)
    assert(!a.pcmOk)
    assert(a == Multimodal.Codec.decodeAudio(junk))
  }

  test("audioEnergy: sine RMS lands at amplitude/sqrt(2); silence at zero") {
    val amp = 0.5
    val sine = wavBytes(8000, 1.0, i => amp * math.sin(2 * math.Pi * 440 * i / 8000.0))
    val e = Multimodal.Codec.audioEnergy(sine, windows = 8)
    assert(e.length == 8)
    e.foreach(v => assert(math.abs(v - amp / math.sqrt(2)) < 0.01, v.toString))
    // first half silent, second half loud — the VAD/silence-trim signal
    val half = wavBytes(8000, 1.0,
      i => if (i < 4000) 0.0 else amp * math.sin(2 * math.Pi * 440 * i / 8000.0))
    val eh = Multimodal.Codec.audioEnergy(half, windows = 8)
    assert(eh.take(4).forall(_ < 0.01) && eh.drop(4).forall(_ > 0.3))
  }

  test("decodeAudios + audioFeatures: fixed schemas over a mixed-corpus DataFrame") {
    val rows = Seq(
      Row(1L, "audio", "audio/wav", wavBytes(8000, 0.25, _ => 0.25), null),
      Row(2L, "audio", "audio/wav", Array.fill[Byte](64)(3), null)) // undecodable
    val df = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
    val meta = Multimodal.decodeAudios(df).orderBy("asset_id").collect()
    assert(meta.map(_.getBoolean(4)).toSeq == Seq(true, false))
    assert(meta.head.getInt(1) == 8000 && meta.head.getLong(3) == 2000)
    val feats = Multimodal.audioFeatures(df, windows = 16)
    assert(feats.select(size(col("energy"))).collect().forall(_.getInt(0) == 16))
    // constant 0.25 signal: RMS == 0.25 in every window
    val e1 = feats.filter(col("asset_id") === 1).select(col("energy"))
      .head.getSeq[Float](0)
    e1.foreach(v => assert(math.abs(v - 0.25) < 0.01))
  }
}
