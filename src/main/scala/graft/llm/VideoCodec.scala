package graft.llm

/** Pure-JVM video codec for the multimodal tier: YUV4MPEG2 (`.y4m`),
  * the uncompressed interchange format codec tooling speaks — an
  * ASCII stream header (`YUV4MPEG2 W<w> H<h> F<num>:<den> ...`),
  * then `FRAME\n`-delimited raw planar frames. 4:2:0 (`C420`-family),
  * 4:2:2 (broadcast tooling's default), 4:4:4, and `Cmono` supported;
  * the luma plane is all the analysis tiers read, so chroma is
  * measured but skipped — a subsampling mode only changes the
  * per-frame SKIP length.
  *
  * This completes the image ([[ImageCodec]]) / audio ([[AudioCodec]])
  * / video triple with the same posture: a REAL format a
  * dependency-free engine can decode honestly, integer arithmetic
  * after the samples, bit-identical on every executor. The reference
  * treats media as opaque bytes end-to-end (no decode stage exists
  * there).
  *
  * Container formats (MP4/MKV) carry entropy-coded codecs (H.264 &c.)
  * that have no place in a zero-dependency JVM engine — the honest
  * seam is: ffmpeg-class tooling demuxes/decodes to y4m out-of-band,
  * this codec owns everything after the pixels.
  */
object VideoCodec {

  /** One decoded frame: luma plane only, row-major. */
  final case class Frame(index: Int, width: Int, height: Int,
                         luma: Array[Int])

  final case class VideoMeta(width: Int, height: Int, fpsNum: Int,
                             fpsDen: Int, nFrames: Int)

  /** Parse the stream header + count frames without materializing
    * pixel arrays — the metadata pass a catalog stats collector runs. */
  def probe(bytes: Array[Byte]): Option[VideoMeta] =
    parse(bytes, sampleEvery = Int.MaxValue).map(_._1)

  /** Decode every `sampleEvery`-th frame (frame 0 always included) —
    * the frame-sampling a 100 TB video corpus needs: pixel work scales
    * with SAMPLED frames, while the byte walk over unsampled frames is
    * an O(1) offset skip per frame, no copy. */
  def sampleFrames(bytes: Array[Byte], sampleEvery: Int): Option[(VideoMeta, Seq[Frame])] =
    parse(bytes, sampleEvery)

  private def parse(bytes: Array[Byte], sampleEvery: Int)
      : Option[(VideoMeta, Seq[Frame])] = {
    if (bytes == null || bytes.length < 10) return None
    try {
      val magic = "YUV4MPEG2"
      var i = 0
      while (i < magic.length) {
        if (bytes(i) != magic.charAt(i)) return None
        i += 1
      }
      // header line: space-separated tagged params, terminated by \n
      var eol = i
      while (eol < bytes.length && bytes(eol) != '\n') eol += 1
      if (eol >= bytes.length) return None
      val header = new String(bytes, i, eol - i, "US-ASCII")
      var w = 0; var h = 0; var fn = 30; var fd = 1
      // chroma samples per luma sample, in 1/4 units: 420 -> two
      // quarter-size planes (+2), 422 -> two half-size planes (+4),
      // 444 -> two full planes (+8), mono -> none (0)
      var chromaQuarters = 2
      header.trim.split(" ").filter(_.nonEmpty).foreach { tag =>
        tag.charAt(0) match {
          case 'W' => w = tag.substring(1).toInt
          case 'H' => h = tag.substring(1).toInt
          case 'F' =>
            val Array(a, b) = tag.substring(1).split(":", 2)
            fn = a.toInt; fd = b.toInt
          case 'C' =>
            val sub = tag.substring(1)
            if (sub.startsWith("420")) chromaQuarters = 2
            else if (sub == "422") chromaQuarters = 4
            else if (sub == "444") chromaQuarters = 8
            else if (sub == "mono") chromaQuarters = 0
            else return None // 411/alpha &c.: refuse rather than misread
          case _ => () // I/A/X tags: irrelevant to the luma plane
        }
      }
      if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
      // subsampled axes must divide evenly or the plane sizes are lies
      if (chromaQuarters == 2 && ((w % 2) != 0 || (h % 2) != 0)) return None
      if (chromaQuarters == 4 && (w % 2) != 0) return None
      // Long math: header-claimed dimensions that overflow Int would
      // wrap frameLen negative, defeat the truncation check below, and
      // either loop forever (off stops advancing) or attempt a multi-GB
      // allocation whose OutOfMemoryError the Exception catch does not
      // convert to None — same hardening as ImageCodec's PNM/BMP paths
      val lumaLenL = w.toLong * h
      val frameLenL = lumaLenL + lumaLenL * chromaQuarters / 4
      if (frameLenL > bytes.length) return None // no frame could fit
      val lumaLen = lumaLenL.toInt
      val frameLen = frameLenL.toInt
      val frameMarker = "FRAME".getBytes("US-ASCII")
      var off = eol + 1
      var idx = 0
      val out = Seq.newBuilder[Frame]
      while (off < bytes.length) {
        // FRAME line (may carry params), then \n, then planes
        var j = 0
        while (j < frameMarker.length) {
          if (off + j >= bytes.length || bytes(off + j) != frameMarker(j))
            return None
          j += 1
        }
        var fe = off + frameMarker.length
        while (fe < bytes.length && bytes(fe) != '\n') fe += 1
        if (fe >= bytes.length) return None
        val dataOff = fe + 1
        if (dataOff + frameLen > bytes.length) return None // truncated frame
        if (idx % sampleEvery == 0 && sampleEvery != Int.MaxValue) {
          val luma = new Array[Int](lumaLen)
          var k = 0
          while (k < lumaLen) { luma(k) = bytes(dataOff + k) & 0xff; k += 1 }
          out += Frame(idx, w, h, luma)
        }
        off = dataOff + frameLen
        idx += 1
      }
      if (idx == 0) return None
      Some((VideoMeta(w, h, fn, fd, idx), out.result()))
    } catch { case _: Exception => None }
  }

  /** Encode mono-as-luma frames to y4m 4:2:0 (chroma planes neutral
    * 128) — the test-side generator's writer. */
  def encodeY4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                frames: Seq[Array[Int]]): Array[Byte] = {
    require(width % 2 == 0 && height % 2 == 0, "4:2:0 needs even dims")
    val lumaLen = width * height
    frames.foreach(f => require(f.length == lumaLen, "bad frame size"))
    val header =
      s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
        .getBytes("US-ASCII")
    val frameLen = lumaLen + lumaLen / 2
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new Array[Byte](
      header.length + frames.size * (marker.length + frameLen))
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    frames.foreach { f =>
      System.arraycopy(marker, 0, out, off, marker.length)
      off += marker.length
      var k = 0
      while (k < lumaLen) {
        out(off + k) = math.max(0, math.min(255, f(k))).toByte
        k += 1
      }
      java.util.Arrays.fill(out, off + lumaLen, off + frameLen, 128.toByte)
      off += frameLen
    }
    out
  }

  /** Per-sampled-frame pHash over the luma plane: the video near-dup
    * primitive. A clip's signature is its ordered hash sequence; two
    * clips near-match when corresponding sampled frames sit within a
    * small hamming radius (re-encoded/re-leveled variants), and
    * shot-level containment falls out of hash-set overlap. */
  def frameHashes(bytes: Array[Byte], sampleEvery: Int)
      : Option[(VideoMeta, Seq[(Int, Long)])] =
    sampleFrames(bytes, sampleEvery).map { case (meta, frames) =>
      (meta, frames.map(f => (f.index, Multimodal.dctHash(
        ImageCodec.resample(f.luma, f.width, f.height, 32, 32)))))
    }
}

/** Deterministic synthetic clips: each frame is the seeded
  * [[SyntheticImages]] raster's luma with a per-frame brightness walk
  * and a horizontally scrolling bright bar — temporal structure the
  * frame hashes can see (static clips would hash identically
  * throughout). */
object SyntheticVideos {

  val Frames = 12

  def generate(seed: Long, brightness: Int = 0): Array[Byte] = {
    val w = SyntheticImages.Width
    val h = SyntheticImages.Height
    val base = ImageCodec.decode(
      SyntheticImages.generate(seed, brightness)).get.gray
    val frames = (0 until Frames).map { f =>
      val luma = new Array[Int](w * h)
      val barX = (f * w / Frames + (seed % w).toInt.abs) % w
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = base(y * w + x) + f * 3 +
            (if (math.abs(x - barX) < 3) 60 else 0)
          luma(y * w + x) = math.max(0, math.min(255, v))
          x += 1
        }
        y += 1
      }
      luma
    }
    VideoCodec.encodeY4m(w, h, 30, 1, frames)
  }
}
