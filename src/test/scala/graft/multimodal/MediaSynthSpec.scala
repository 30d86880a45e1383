package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Unit gate for the synth↔codec roundtrip invariants the
  * `mm1`/`mm2` catalog oracles rely on (see MediaSynth scaladoc): decoded
  * properties must equal the generator arithmetic EXACTLY, including the
  * IEEE-exactness of the constant-signal RMS. Pure JVM — no SparkSession. */
class MediaSynthSpec extends AnyFunSuite {

  test("constantPng roundtrips geometry, channels, and exact gray level") {
    for (gray <- Seq(0, 1, 17, 128, 254, 255); (w, h) <- Seq((16, 63), (48, 16))) {
      val d = Multimodal.Codec.decodeImage(MediaSynth.constantPng(w, h, gray))
      assert((d.width, d.height, d.channels) == (w, h, 3), s"gray=$gray")
      val emb = Multimodal.Codec.featurize(MediaSynth.constantPng(w, h, gray), 16)
      assert(emb.length == 16)
      emb.foreach { cell =>
        assert(math.round(cell.toDouble * 255d) == gray,
          s"cell $cell should quantize to $gray")
      }
    }
  }

  test("constantWav roundtrips rate/channels/frames and bit-exact RMS") {
    for (amp <- Seq(500, 1000, 16000, 32000); ch <- Seq(1, 2)) {
      val bytes = MediaSynth.constantWav(11000, ch, 456, amp)
      val d = Multimodal.Codec.decodeAudio(bytes)
      assert(d.pcmOk, s"amp=$amp ch=$ch must take the real decode path")
      assert((d.sampleRateHz, d.channels, d.frames) == (11000, ch, 456L))
      val energy = Multimodal.Codec.audioEnergy(bytes, 4)
      assert(energy.length == 4)
      // exact, not approximate: constant-signal RMS is amp/32768 bit-for-bit
      energy.foreach(w => assert(w == (amp / 32768.0).toFloat, s"window $w amp=$amp"))
    }
  }

  test("negative and zero-adjacent amplitudes stay exact through downmix") {
    val bytes = MediaSynth.constantWav(8000, 2, 400, -1234)
    val energy = Multimodal.Codec.audioEnergy(bytes, 4)
    // RMS is sign-free: |-1234|/32768
    energy.foreach(w => assert(w == (1234 / 32768.0).toFloat))
  }
}
