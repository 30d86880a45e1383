package graft.multimodal

/** Deterministic real-container media synthesis — the fixture half of the
  * multimodal correctness gate (`catalog/MultimodalCatalog`).
  *
  * Each generator emits REAL encoded bytes through the same JDK codec
  * family `Multimodal.Codec` decodes with (`javax.imageio` /
  * `javax.sound.sampled`), parameterized so every decoded property is a
  * pure arithmetic function of the generator inputs. That is what lets a
  * SQL engine with no codec at all (the DuckDB oracle) predict the decode
  * output: the catalog derives (w, h, gray, rate, amp, …) from `doc_id`
  * with integer arithmetic, Spark encodes → decodes through the real
  * codecs, and the oracle computes the same arithmetic directly. Any
  * regression in the codec path — fallback taken, geometry misread, PCM
  * conversion drift — breaks the hash compare.
  *
  * Synthesis also stands in for corpus ingestion in tests and local runs:
  * the container ships no binary media fixtures, so the generators are the
  * only source of genuinely decodable payloads.
  */
object MediaSynth {

  /** Constant-gray `w×h` PNG (true color, 3 channels). Decode invariants:
    * `decodeImage` → (w, h, 3); every cell of the pooled-luminance grid ≈
    * gray/255 (exact to ~1e-13 — BT.601 weights sum to 1, so a constant
    * (g,g,g) image pools to g/255 in every cell; `bround(cell*255)`
    * recovers g exactly). */
  def constantPng(w: Int, h: Int, gray: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad geometry ${w}x$h")
    require(gray >= 0 && gray <= 255, s"gray out of range: $gray")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgb = (gray << 16) | (gray << 8) | gray
    val g2d = img.createGraphics()
    try { g2d.setColor(new java.awt.Color(rgb)); g2d.fillRect(0, 0, w, h) }
    finally g2d.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Constant-amplitude 16-bit PCM WAV: `frames` frames of `channels`
    * channels at `sampleRateHz`, every sample exactly `amp`. Decode
    * invariants: `decodeAudio` → (rate, channels, frames, pcmOk=true);
    * every RMS window of `audioEnergy` is EXACTLY amp/32768 — the window
    * sums n identical exact doubles (amp² ≤ 2^30, n·amp² < 2^53 so every
    * partial sum is an exactly-representable integer), divides back to
    * amp², and IEEE sqrt of a perfect square is exact — so
    * `bround(window*32768)` recovers amp bit-exactly. */
  def constantWav(sampleRateHz: Int, channels: Int, frames: Int, amp: Int): Array[Byte] = {
    require(sampleRateHz > 0 && channels > 0 && frames > 0,
      s"bad audio shape rate=$sampleRateHz ch=$channels frames=$frames")
    require(amp >= -32768 && amp <= 32767, s"amp out of 16-bit range: $amp")
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRateHz.toFloat, 16, channels, channels * 2, sampleRateHz.toFloat,
      /* bigEndian = */ false)
    val pcm = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames * channels) {
      pcm(i * 2) = (amp & 0xff).toByte
      pcm(i * 2 + 1) = ((amp >> 8) & 0xff).toByte
      i += 1
    }
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      in, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
