package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** RIFF/PCM-16 decode, chunk walking, stereo downmix, integer acoustic
  * features, and the gain-invariance of the energy fingerprint. */
class AudioCodecSpec extends AnyFunSuite {

  test("WAV encode -> decode round-trips samples bit-exactly") {
    val samples = Array(0, 1000, -1000, 32767, -32768, 7, -7)
    val a = AudioCodec.decode(AudioCodec.encodeWav(8000, samples)).get
    assert(a.sampleRate === 8000 && a.channels === 1)
    assert(a.samples.toSeq === samples.toSeq)
  }

  test("chunk walker skips LIST chunks before data; stereo downmixes") {
    // hand-build: RIFF + fmt(stereo) + LIST(4 junk bytes) + data
    val frames = Array((1000, 2000), (-500, -700), (30000, 30000))
    val dataLen = frames.length * 4
    val listLen = 4
    val total = 12 + 8 + 16 + 8 + listLen + 8 + dataLen
    val b = new Array[Byte](total)
    def asc(o: Int, s: String): Unit =
      s.zipWithIndex.foreach { case (c, i) => b(o + i) = c.toByte }
    def le32(o: Int, v: Int): Unit = (0 to 3).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    def le16(o: Int, v: Int): Unit = (0 to 1).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    asc(0, "RIFF"); le32(4, total - 8); asc(8, "WAVE")
    asc(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 2)
    le32(24, 16000); le32(28, 16000 * 4); le16(32, 4); le16(34, 16)
    asc(36, "LIST"); le32(40, listLen) // junk chunk the walker must skip
    val dOff = 44 + listLen
    asc(dOff, "data"); le32(dOff + 4, dataLen)
    frames.zipWithIndex.foreach { case ((l, r), i) =>
      le16(dOff + 8 + i * 4, l & 0xffff); le16(dOff + 8 + i * 4 + 2, r & 0xffff)
    }
    val a = AudioCodec.decode(b).get
    assert(a.channels === 2 && a.sampleRate === 16000)
    assert(a.samples.toSeq === frames.map { case (l, r) => (l + r) / 2 }.toSeq)
  }

  test("non-audio, truncated, and non-PCM payloads decode to None") {
    assert(AudioCodec.decode("not audio at all, just text bytes ...".getBytes).isEmpty)
    assert(AudioCodec.decode(null).isEmpty)
    assert(AudioCodec.decode(Array[Byte]()).isEmpty)
    val full = AudioCodec.encodeWav(8000, Array.fill(100)(5))
    assert(AudioCodec.decode(full.take(50)).isEmpty) // truncated data chunk
    val nonPcm = full.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    assert(AudioCodec.decode(nonPcm).isEmpty)
  }

  test("features: hand-computable integers on a tiny signal") {
    val s = Array(100, -100, 200, 0, -300)
    val f = AudioCodec.features(AudioCodec.DecodedAudio(8000, 1, s))
    assert(f.nSamples === 5L)
    assert(f.sumAbs === 700L)
    assert(f.peak === 300)
    assert(f.zeroCrossings === 3L) // +->-, -->+, +->- (zero skipped)
    assert(f.energyFingerprint === 0L) // < 64 samples: no frames
  }

  test("energy fingerprint is gain-invariant within a small hamming radius") {
    (0L to 19L).foreach { seed =>
      val o = AudioCodec.features(
        AudioCodec.decode(SyntheticAudio.generate(seed, 100)).get)
      val v = AudioCodec.features(
        AudioCodec.decode(SyntheticAudio.generate(seed, 50)).get)
      val ham = java.lang.Long.bitCount(o.energyFingerprint ^ v.energyFingerprint)
      assert(ham <= 4, s"seed $seed hamming $ham")
      // and DIFFERENT seeds give genuinely different fingerprints
      if (seed > 0) {
        val prev = AudioCodec.features(
          AudioCodec.decode(SyntheticAudio.generate(seed - 1, 100)).get)
        assert(prev.energyFingerprint != o.energyFingerprint)
      }
    }
  }
}
