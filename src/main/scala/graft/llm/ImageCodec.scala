package graft.llm

/** Pure-JVM image codec for the multimodal tier: binary PPM (P6),
  * binary PGM (P5), and uncompressed 24-bit BMP — the formats a
  * dependency-free engine can decode honestly. Everything here is
  * integer arithmetic with a fixed evaluation order, so decoded
  * pixels, grayscale, and resampled grids are bit-identical on every
  * executor of a heterogeneous cluster (the same contract as
  * [[Multimodal.dctHash]]'s StrictMath basis).
  *
  * Reference treats media as opaque bytes end-to-end (no decode
  * stage exists there); this codec is what graduates the decoder
  * seam from a byte-stub to real pixels while keeping zero native
  * dependencies.
  */
object ImageCodec {

  /** Decoded raster: grayscale luma (0-255) in row-major order. */
  final case class DecodedImage(width: Int, height: Int, gray: Array[Int],
                                format: String)

  /** BT.601 integer luma — fixed truncating arithmetic. */
  @inline private def luma(r: Int, g: Int, b: Int): Int =
    (299 * r + 587 * g + 114 * b) / 1000

  // ------------------------------------------------------------ decode

  /** Sniffs magic bytes and decodes; None when the payload is not a
    * recognized (or well-formed) image — the caller's seam decides
    * the fallback. */
  def decode(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.length < 2) return None
    try {
      (bytes(0), bytes(1)) match {
        case ('P', '6') => decodePnm(bytes, rgb = true)
        case ('P', '5') => decodePnm(bytes, rgb = false)
        case ('B', 'M') => decodeBmp(bytes)
        // JPEG (FF D8) / PNG (89 'P'): the in-JDK javax.imageio
        // decoders, behind the same pixel contract
        case (-1, -40) => decodeImageIo(bytes, "jpeg")
        case (-119, 'P') => decodeImageIo(bytes, "png")
        case _ => None
      }
    } catch { case _: Exception => None } // truncated/corrupt: not an image
  }

  /** PNM header: ASCII tokens separated by whitespace, `#` comments to
    * end-of-line, single whitespace byte after maxval, then raw
    * samples. Returns (width, height, maxval, dataStart). */
  private def pnmHeader(b: Array[Byte]): (Int, Int, Int, Int) = {
    var i = 2
    val vals = new Array[Int](3)
    var got = 0
    while (got < 3) {
      while (i < b.length &&
        (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t' ||
          b(i) == '#')) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else i += 1
      }
      var v = 0
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
      }
      if (!any) throw new IllegalArgumentException("bad PNM header")
      vals(got) = v; got += 1
    }
    i += 1 // the single whitespace byte before the raster
    (vals(0), vals(1), vals(2), i)
  }

  private def decodePnm(b: Array[Byte], rgb: Boolean): Option[DecodedImage] = {
    val (w, h, maxv, start) = pnmHeader(b)
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    // Long math: a corrupt header like 65536x65536 wraps Int (w*h == 0)
    // and would dodge the length check below, then crash or OOM far
    // from here — dimension claims beyond the payload are "not an
    // image", the same None as any other truncation
    val nL = w.toLong * h
    val needL = if (rgb) nL * 3 else nL
    if (b.length - start < needL) return None
    val n = nL.toInt // needL <= b.length bounds nL well under Int.MaxValue
    val gray = new Array[Int](n)
    var i = 0
    while (i < n) {
      val g =
        if (rgb) {
          val o = start + i * 3
          luma(b(o) & 0xff, b(o + 1) & 0xff, b(o + 2) & 0xff)
        } else b(start + i) & 0xff
      gray(i) = if (maxv == 255) g else g * 255 / maxv
      i += 1
    }
    Some(DecodedImage(w, h, gray, if (rgb) "ppm" else "pgm"))
  }

  @inline private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  @inline private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** BITMAPINFOHEADER, 24 bpp, BI_RGB only; positive height is
    * bottom-up (the common case), negative is top-down. Rows pad to
    * 4-byte boundaries; samples are BGR. */
  private def decodeBmp(b: Array[Byte]): Option[DecodedImage] = {
    if (b.length < 54) return None
    val dataOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    if (hdrSize < 40) return None
    val w = le32(b, 18)
    val rawH = le32(b, 22)
    val h = math.abs(rawH)
    val topDown = rawH < 0
    if (le16(b, 28) != 24 || le32(b, 30) != 0) return None // bpp / BI_RGB
    if (w <= 0 || h == 0 || dataOff < 54 || dataOff > b.length) return None
    // Long math end-to-end: header-claimed dimensions that overflow Int
    // must fail the length check, not wrap into a bogus allocation
    val rowBytes = (w.toLong * 3 + 3) / 4 * 4
    if (b.length - dataOff < rowBytes * h) return None
    val gray = new Array[Int](w * h) // rowBytes*h <= b.length bounds w*h
    val rb = rowBytes.toInt
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val o = dataOff + srcRow * rb
      var x = 0
      while (x < w) {
        val p = o + x * 3
        gray(y * w + x) = luma(b(p + 2) & 0xff, b(p + 1) & 0xff, b(p) & 0xff)
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(w, h, gray, "bmp"))
  }

  /** JPEG/PNG via the JDK's own `javax.imageio` (public API, zero
    * added dependencies; works headless). The BufferedImage is read
    * out as packed ARGB in one bulk `getRGB` and fed through the SAME
    * integer BT.601 luma as every other format, so everything
    * downstream of the RGB samples (grayscale, resample, DCT) keeps
    * the fixed-arithmetic determinism contract; the JPEG entropy
    * decode itself is the JDK's pure-Java path — deterministic for a
    * given JDK, not bit-pinned across JDK major versions (tests gate
    * structure-preserving invariants, not raw JPEG sample goldens —
    * PNG is lossless, so its round-trips ARE bit-exact). */
  private def decodeImageIo(b: Array[Byte], fmt: String): Option[DecodedImage] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue) return None
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    val gray = new Array[Int](w * h)
    var i = 0
    while (i < gray.length) {
      val p = argb(i)
      gray(i) = luma((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      i += 1
    }
    Some(DecodedImage(w, h, gray, fmt))
  }

  // ------------------------------------------------------------ encode

  private def toBufferedImage(w: Int, h: Int, rgb: Array[Int])
      : java.awt.image.BufferedImage = {
    require(rgb.length == w * h, s"rgb length ${rgb.length} != $w*$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, rgb, 0, w)
    img
  }

  /** PNG from packed 0xRRGGBB pixels — lossless, so
    * decode(encodePng(...)) round-trips pixels bit-exactly. */
  def encodePng(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(w, h, rgb), "png", bos)
    bos.toByteArray
  }

  /** JPEG from packed 0xRRGGBB pixels at an explicit quality (default
    * 0.9) — explicit because the writer's default is
    * implementation-defined and the tests want one fixed operating
    * point for the lossy round-trip. */
  def encodeJpeg(w: Int, h: Int, rgb: Array[Int],
                 quality: Float = 0.9f): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null,
        new javax.imageio.IIOImage(toBufferedImage(w, h, rgb), null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Binary PPM from packed 0xRRGGBB pixels, row-major. */
  def encodePpm(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h, s"rgb length ${rgb.length} != $w*$h")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < rgb.length) {
      val o = header.length + i * 3
      out(o) = ((rgb(i) >> 16) & 0xff).toByte
      out(o + 1) = ((rgb(i) >> 8) & 0xff).toByte
      out(o + 2) = (rgb(i) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Uncompressed bottom-up 24-bit BMP from packed 0xRRGGBB pixels. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h, s"rgb length ${rgb.length} != $w*$h")
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val out = new Array[Byte](54 + dataSize)
    def putLe32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + dataSize); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, w); putLe32(22, h)
    out(26) = 1; out(28) = 24 // planes, bpp (compression stays 0)
    putLe32(34, dataSize)
    var y = 0
    while (y < h) {
      val o = 54 + (h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val p = rgb(y * w + x)
        out(o + x * 3) = (p & 0xff).toByte
        out(o + x * 3 + 1) = ((p >> 8) & 0xff).toByte
        out(o + x * 3 + 2) = ((p >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  // ---------------------------------------------------------- resample

  /** Area-average downsample (box filter) to `outW` x `outH`,
    * truncating integer mean per cell — the deterministic stand-in
    * for bilinear. Cells cover `[x*w/outW, (x+1)*w/outW)`; when the
    * source is smaller than the target the cell degenerates to
    * nearest-neighbor. */
  def resample(gray: Array[Int], w: Int, h: Int, outW: Int, outH: Int): Array[Int] = {
    require(gray.length == w * h, s"gray length ${gray.length} != $w*$h")
    val out = new Array[Int](outW * outH)
    var oy = 0
    while (oy < outH) {
      val y0 = oy * h / outH
      val y1 = math.max(y0 + 1, (oy + 1) * h / outH)
      var ox = 0
      while (ox < outW) {
        val x0 = ox * w / outW
        val x1 = math.max(x0 + 1, (ox + 1) * w / outW)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += gray(y * w + x); x += 1 }
          y += 1
        }
        out(oy * outW + ox) = (s / ((y1 - y0).toLong * (x1 - x0))).toInt
        ox += 1
      }
      oy += 1
    }
    out
  }
}

/** Deterministic synthetic images, seeded per document: a smooth
  * two-corner gradient background with three seeded rectangles —
  * enough low-frequency structure for the DCT tier to produce
  * meaningful, well-spread hashes (pure noise would not). The same
  * seed always yields byte-identical PPM output, so golden-value
  * oracles over decoded features are stable across rounds. */
object SyntheticImages {

  /** splitmix64 — the standard avalanche mix, here as the color and
    * geometry source so images differ chaotically across seeds. */
  private def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  val Width = 64
  val Height = 48

  /** PPM image for a seed; `brightness` shifts every channel
    * (clamped) — the "same image, re-exposed" near-duplicate used to
    * exercise pHash invariance. */
  def generate(seed: Long, brightness: Int = 0): Array[Byte] =
    ImageCodec.encodePpm(Width, Height, generateRgb(seed, brightness))

  /** The packed-0xRRGGBB raster behind [[generate]] — the input for
    * re-encoding the same image through the lossy/lossless `imageio`
    * writers (JPEG/PNG round-trip queries). */
  def generateRgb(seed: Long, brightness: Int = 0): Array[Int] = {
    val m0 = mix(seed)
    val m1 = mix(m0)
    val m2 = mix(m1)
    val c0 = (m0 & 0xffffffL).toInt
    val c1 = (m1 & 0xffffffL).toInt
    val rgb = new Array[Int](Width * Height)
    var y = 0
    while (y < Height) {
      var x = 0
      while (x < Width) {
        // bilinear blend between two corner colors
        def ch(shift: Int): Int = {
          val a = (c0 >> shift) & 0xff
          val b = (c1 >> shift) & 0xff
          (a * (Width - 1 - x) * (Height - 1 - y) +
            b * (x * y + (Width - 1 - x) * y + x * (Height - 1 - y))) /
            ((Width - 1) * (Height - 1))
        }
        rgb(y * Width + x) = (ch(16) << 16) | (ch(8) << 8) | ch(0)
        x += 1
      }
      y += 1
    }
    // three seeded rectangles
    var k = 0
    var m = m2
    while (k < 3) {
      m = mix(m)
      val rx = ((m >>> 8) % Width).toInt.abs
      val ry = ((m >>> 24) % Height).toInt.abs
      val rw = 4 + ((m >>> 40) % (Width / 3)).toInt.abs
      val rh = 4 + ((m >>> 52) % (Height / 3)).toInt.abs
      val rc = (mix(m) & 0xffffffL).toInt
      var yy = ry
      while (yy < math.min(Height, ry + rh)) {
        var xx = rx
        while (xx < math.min(Width, rx + rw)) {
          rgb(yy * Width + xx) = rc
          xx += 1
        }
        yy += 1
      }
      k += 1
    }
    if (brightness != 0) {
      var i = 0
      while (i < rgb.length) {
        def clamp(v: Int) = math.max(0, math.min(255, v))
        val p = rgb(i)
        rgb(i) = (clamp(((p >> 16) & 0xff) + brightness) << 16) |
          (clamp(((p >> 8) & 0xff) + brightness) << 8) |
          clamp((p & 0xff) + brightness)
        i += 1
      }
    }
    rgb
  }
}
