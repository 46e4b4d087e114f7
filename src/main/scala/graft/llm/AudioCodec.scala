package graft.llm

/** Pure-JVM audio codec for the multimodal tier: RIFF/WAVE with
  * 16-bit signed PCM (mono or interleaved stereo) — the audio format
  * a dependency-free engine can decode honestly, the way PPM/BMP are
  * its image counterparts (`/root/reference` treats media as opaque
  * bytes end-to-end; no decode stage exists there).
  *
  * Everything downstream of the samples is integer arithmetic with a
  * fixed evaluation order, so the extracted features are bit-identical
  * on every executor of a heterogeneous cluster — the same
  * determinism contract as [[ImageCodec]] / [[Multimodal.dctHash]].
  */
object AudioCodec {

  /** Decoded clip: mono samples (stereo averaged, truncating), plus
    * the header facts a pipeline filters on. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
                                samples: Array[Int])

  @inline private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  @inline private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** RIFF/WAVE, PCM (audioFormat=1), 16-bit only; walks the chunk list
    * (fmt may be followed by LIST/fact chunks before data). None for
    * anything malformed, truncated, or non-PCM-16 — the caller's seam
    * decides the fallback, same contract as [[ImageCodec.decode]]. */
  def decode(bytes: Array[Byte]): Option[DecodedAudio] = {
    if (bytes == null || bytes.length < 44) return None
    try {
      if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' ||
        bytes(10) != 'V' || bytes(11) != 'E') return None
      var off = 12
      var rate = 0
      var channels = 0
      var bits = 0
      var fmtOk = false
      var dataOff = -1
      var dataLen = 0
      while (off + 8 <= bytes.length && (dataOff < 0 || !fmtOk)) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val sz = le32(bytes, off + 4)
        // Long math: a declared chunk size near Int.MaxValue would wrap
        // `off + 8 + sz` negative, pass this check, and the data-chunk
        // array allocation below would throw OutOfMemoryError — an
        // Error the catch-all does not convert to None
        if (sz < 0 || off.toLong + 8L + sz > bytes.length) return None
        id match {
          case "fmt " =>
            if (sz < 16) return None
            val audioFormat = le16(bytes, off + 8)
            channels = le16(bytes, off + 10)
            rate = le32(bytes, off + 12)
            bits = le16(bytes, off + 22)
            fmtOk = audioFormat == 1 && bits == 16 &&
              (channels == 1 || channels == 2) && rate > 0
            if (!fmtOk) return None
          case "data" =>
            dataOff = off + 8
            dataLen = sz
          case _ => () // LIST/fact/cue: skip
        }
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      if (!fmtOk || dataOff < 0) return None
      val frameBytes = 2 * channels
      val n = dataLen / frameBytes
      val mono = new Array[Int](n)
      var i = 0
      while (i < n) {
        val o = dataOff + i * frameBytes
        val s0 = le16(bytes, o).toShort.toInt
        mono(i) =
          if (channels == 1) s0
          else (s0 + le16(bytes, o + 2).toShort.toInt) / 2 // truncating mean
        i += 1
      }
      Some(DecodedAudio(rate, channels, mono))
    } catch { case _: Exception => None }
  }

  /** 16-bit PCM WAVE from mono samples (values clamped to int16). */
  def encodeWav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(o: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def putLe32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    putAscii(0, "RIFF"); putLe32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16)
    putLe16(20, 1); putLe16(22, 1) // PCM, mono
    putLe32(24, sampleRate); putLe32(28, sampleRate * 2)
    putLe16(32, 2); putLe16(34, 16) // block align, bits
    putAscii(36, "data"); putLe32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-32768, math.min(32767, samples(i)))
      putLe16(44 + i * 2, v & 0xffff)
      i += 1
    }
    out
  }

  /** Frame-level features over decoded samples — the acoustic analogue
    * of [[ImageCodec.resample]]-then-hash: deterministic integers only.
    *
    *   - `sumAbs`: Σ|s| (long — the loudness integral)
    *   - `peak`: max |s|
    *   - `zeroCrossings`: sign changes between consecutive non-zero
    *     samples (the classic voiced/unvoiced discriminator)
    *   - `energyFingerprint`: 64-bit sign hash of per-band energy
    *     deltas over 64 equal frames — frame i's bit is 1 when its
    *     energy exceeds the previous frame's (the Shazam-style
    *     descriptor reduced to its deterministic core; robust to
    *     uniform gain, which scales every frame equally)
    */
  final case class AudioFeatures(nSamples: Long, sumAbs: Long, peak: Int,
                                 zeroCrossings: Long, energyFingerprint: Long)

  def features(a: DecodedAudio): AudioFeatures = {
    val s = a.samples
    var sumAbs = 0L
    var peak = 0
    var zc = 0L
    var lastSign = 0
    var i = 0
    while (i < s.length) {
      val v = s(i)
      val av = math.abs(v)
      sumAbs += av
      if (av > peak) peak = av
      val sign = Integer.signum(v)
      if (sign != 0) {
        if (lastSign != 0 && sign != lastSign) zc += 1
        lastSign = sign
      }
      i += 1
    }
    // 64 equal frames (last absorbs the remainder); energy = Σ s² per
    // frame in longs — exact, order-fixed
    val frames = 64
    val energies = new Array[Long](frames)
    if (s.length >= frames) {
      val w = s.length / frames
      var f = 0
      while (f < frames) {
        val end = if (f == frames - 1) s.length else (f + 1) * w
        var e = 0L
        var j = f * w
        while (j < end) { e += s(j).toLong * s(j); j += 1 }
        energies(f) = e
        f += 1
      }
    }
    var fp = 0L
    var f = 1
    while (f < frames) {
      if (energies(f) > energies(f - 1)) fp |= 1L << (f - 1)
      f += 1
    }
    AudioFeatures(s.length.toLong, sumAbs, peak, zc, fp)
  }
}

/** Deterministic synthetic clips, seeded per document: a two-tone
  * integer sine mix with a seeded envelope — enough band structure for
  * the energy fingerprint to spread across seeds while staying
  * bit-reproducible (StrictMath sine, fixed truncation). */
object SyntheticAudio {

  private def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  val SampleRate = 8000
  val NumSamples = 4000 // half a second

  /** WAV clip for a seed; `gain` scales every sample by `gain/100`
    * (integer) — the "same clip, re-leveled" variant whose energy
    * fingerprint must match the original (uniform gain preserves
    * every frame-energy comparison). */
  def generate(seed: Long, gain: Int = 100): Array[Byte] = {
    val m0 = mix(seed)
    val m1 = mix(m0)
    val f1 = 200 + (m0 & 0x3ff).toInt          // 200..1223 Hz
    val f2 = 400 + ((m1 >>> 20) & 0x7ff).toInt // 400..2447 Hz
    val a1 = 6000 + ((m0 >>> 40) & 0xfff).toInt
    val a2 = 4000 + ((m1 >>> 44) & 0xfff).toInt
    val samples = new Array[Int](NumSamples)
    var i = 0
    while (i < NumSamples) {
      val t = i.toDouble / SampleRate
      // seeded piecewise envelope, one block per fingerprint frame:
      // consecutive frames carry genuinely different 6-bit factors, so
      // frame-energy margins dominate gain-truncation noise and the
      // fingerprint's sign pattern survives re-leveling
      val env = (32 + ((mix(seed + i / (NumSamples / 64)) >>> 16) & 0x3f)).toInt
      val v = (a1 * StrictMath.sin(2 * StrictMath.PI * f1 * t) +
        a2 * StrictMath.sin(2 * StrictMath.PI * f2 * t)).toInt
      samples(i) = (v * env / 96) * gain / 100
      i += 1
    }
    AudioCodec.encodeWav(SampleRate, samples)
  }
}
