package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Y4M parse/encode round-trip, frame sampling, malformed-input None,
  * and the temporal invariance of the frame-hash signature. */
class VideoCodecSpec extends AnyFunSuite {

  private def grad(w: Int, h: Int, shift: Int): Array[Int] =
    Array.tabulate(w * h)(i => (i % w + shift) % 256)

  test("y4m encode -> decode round-trips meta and every sampled luma plane") {
    val (w, h) = (8, 6)
    val frames = (0 until 5).map(f => grad(w, h, f * 10))
    val bytes = VideoCodec.encodeY4m(w, h, 25, 1, frames)
    val meta = VideoCodec.probe(bytes).get
    assert(meta === VideoCodec.VideoMeta(8, 6, 25, 1, 5))
    val (_, sampled) = VideoCodec.sampleFrames(bytes, 2).get
    assert(sampled.map(_.index) === Seq(0, 2, 4))
    sampled.foreach(f => assert(f.luma.toSeq === frames(f.index).toSeq))
  }

  test("4:4:4 / 4:2:2 / mono streams parse; unsupported subsampling refuses") {
    val (w, h) = (4, 2)
    val luma = grad(w, h, 0)
    def stream(c: String, chromaBytesPerFrame: Int, frames: Int = 1): Array[Byte] =
      s"YUV4MPEG2 W$w H$h F30:1 C$c\n".getBytes("US-ASCII") ++
        Array.fill(frames)("FRAME\n".getBytes("US-ASCII") ++
          luma.map(_.toByte) ++
          Array.fill(chromaBytesPerFrame)(128.toByte)).flatten
    // a subsampling mode only changes the per-frame skip length — the
    // luma plane must come back identical under every supported C tag
    for ((c, chroma) <- Seq(("444", w * h * 2), ("422", w * h),
                            ("420jpeg", w * h / 2), ("mono", 0))) {
      val (meta, fs) = VideoCodec.sampleFrames(stream(c, chroma, frames = 2), 1)
        .getOrElse(fail(s"C$c refused"))
      assert(meta.nFrames === 2, s"C$c")
      assert(fs.map(_.index) === Seq(0, 1), s"C$c")
      fs.foreach(f => assert(f.luma.toSeq === luma.toSeq, s"C$c"))
    }
    // 4:1:1 (and other exotica) stay refused rather than misread
    assert(VideoCodec.sampleFrames(stream("411", w * h / 2), 1).isEmpty)
    // 4:2:2 with odd width: the half-width chroma plane size is a lie
    val odd = s"YUV4MPEG2 W3 H2 F30:1 C422\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++ Array.fill(12)(7.toByte)
    assert(VideoCodec.sampleFrames(odd, 1).isEmpty)
  }

  test("malformed and truncated streams decode to None, never throw") {
    assert(VideoCodec.probe("MPEG4YUV nonsense".getBytes).isEmpty)
    assert(VideoCodec.probe(null).isEmpty)
    val ok = VideoCodec.encodeY4m(4, 4, 30, 1, Seq(grad(4, 4, 0)))
    assert(VideoCodec.probe(ok.dropRight(3)).isEmpty) // truncated frame
    assert(VideoCodec.probe(ok.take(12)).isEmpty)     // truncated header
  }

  test("frame hashes: re-exposed clips stay close, distinct seeds differ") {
    val a = VideoCodec.frameHashes(SyntheticVideos.generate(5L), 3).get
    val b = VideoCodec.frameHashes(SyntheticVideos.generate(5L, 12), 3).get
    val c = VideoCodec.frameHashes(SyntheticVideos.generate(6L), 3).get
    assert(a._1.nFrames === SyntheticVideos.Frames)
    assert(a._2.map(_._1) === Seq(0, 3, 6, 9))
    a._2.zip(b._2).foreach { case ((i, ha), (j, hb)) =>
      assert(i === j)
      assert(java.lang.Long.bitCount(ha ^ hb) <= 10, s"frame $i")
    }
    // temporal structure: within one clip, frames hash differently
    assert(a._2.map(_._2).distinct.size > 1)
    // different seeds: far apart on frame 0
    assert(java.lang.Long.bitCount(a._2.head._2 ^ c._2.head._2) > 10)
  }
}
