package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Real pixel path: PPM/PGM/BMP decode, deterministic resample, the
  * graduated Multimodal seam (real dimensions, real luma under the
  * DCT hash), and pHash invariance over genuinely decoded images. */
class ImageCodecSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val rgb2x2 = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
  // BT.601 integer luma of the four pixels
  private val gray2x2 = Array(299 * 255 / 1000, 587 * 255 / 1000, 114 * 255 / 1000, 255)

  test("PPM encode -> decode round-trips dimensions and luma") {
    val img = ImageCodec.decode(ImageCodec.encodePpm(2, 2, rgb2x2)).get
    assert(img.format === "ppm" && img.width === 2 && img.height === 2)
    assert(img.gray.toSeq === gray2x2.toSeq)
  }

  test("BMP encode -> decode agrees with the PPM decode of the same pixels") {
    // width 3: exercises the 4-byte row padding
    val rgb = Array(0x102030, 0x405060, 0x708090, 0xa0b0c0, 0xd0e0f0, 0x112233)
    val viaBmp = ImageCodec.decode(ImageCodec.encodeBmp(3, 2, rgb)).get
    val viaPpm = ImageCodec.decode(ImageCodec.encodePpm(3, 2, rgb)).get
    assert(viaBmp.format === "bmp")
    assert(viaBmp.width === 3 && viaBmp.height === 2)
    assert(viaBmp.gray.toSeq === viaPpm.gray.toSeq)
  }

  test("PGM decodes raw gray; header comments and whitespace survive") {
    val bytes = "P5 # a comment\n2 2 # dims\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40)
    val img = ImageCodec.decode(bytes).get
    assert(img.format === "pgm")
    assert(img.gray.toSeq === Seq(10, 20, 30, 40))
  }

  test("PNG encode -> decode is bit-exact against the PPM decode (lossless)") {
    val rgb = SyntheticImages.generateRgb(7L)
    val w = SyntheticImages.Width; val h = SyntheticImages.Height
    val viaPng = ImageCodec.decode(ImageCodec.encodePng(w, h, rgb)).get
    val viaPpm = ImageCodec.decode(ImageCodec.encodePpm(w, h, rgb)).get
    assert(viaPng.format === "png")
    assert(viaPng.width === w && viaPng.height === h)
    assert(viaPng.gray.toSeq === viaPpm.gray.toSeq)
  }

  test("JPEG encode -> decode preserves dimensions and stays luma-close") {
    val rgb = SyntheticImages.generateRgb(7L)
    val w = SyntheticImages.Width; val h = SyntheticImages.Height
    val viaJpeg = ImageCodec.decode(ImageCodec.encodeJpeg(w, h, rgb)).get
    val viaPpm = ImageCodec.decode(ImageCodec.encodePpm(w, h, rgb)).get
    assert(viaJpeg.format === "jpeg")
    assert(viaJpeg.width === w && viaJpeg.height === h)
    // lossy: per-pixel luma error at q=0.9 stays small in aggregate
    val mae = viaJpeg.gray.zip(viaPpm.gray)
      .map { case (a, b) => math.abs(a - b) }.sum.toDouble / (w * h)
    assert(mae < 8.0, s"mean abs luma error $mae")
    // and the DCT hash sees them as the same image
    val hJ = Multimodal.dctHash(ImageCodec.resample(viaJpeg.gray, w, h, 32, 32))
    val hP = Multimodal.dctHash(ImageCodec.resample(viaPpm.gray, w, h, 32, 32))
    assert(java.lang.Long.bitCount(hJ ^ hP) <= 10)
  }

  test("non-images and truncated images decode to None, never throw") {
    assert(ImageCodec.decode("plain text payload".getBytes).isEmpty)
    assert(ImageCodec.decode(Array[Byte]()).isEmpty)
    assert(ImageCodec.decode(null).isEmpty)
    val full = ImageCodec.encodePpm(4, 4, Array.fill(16)(0x808080))
    assert(ImageCodec.decode(full.dropRight(5)).isEmpty) // truncated raster
    val bmp = ImageCodec.encodeBmp(4, 4, Array.fill(16)(0x808080))
    assert(ImageCodec.decode(bmp.take(40)).isEmpty) // truncated header
  }

  test("area resample averages blocks down and nearest-neighbors up") {
    // 4x4 -> 2x2: each output is the truncating mean of a 2x2 block
    val g = Array(
      0, 10, 100, 110,
      20, 30, 120, 130,
      200, 210, 50, 51,
      220, 230, 52, 53)
    assert(ImageCodec.resample(g, 4, 4, 2, 2).toSeq === Seq(15, 115, 215, 51))
    // 2x2 -> 4x4: degenerate cells replicate the nearest source pixel
    val up = ImageCodec.resample(Array(1, 2, 3, 4), 2, 2, 4, 4)
    assert(up.toSeq === Seq(1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
  }

  test("extractFeatures reports REAL dimensions for decodable payloads") {
    import spark.implicits._
    val media = Seq(
      (1L, "image/ppm", SyntheticImages.generate(1L)),
      (2L, "image/bmp", ImageCodec.encodeBmp(5, 7, Array.fill(35)(0x334455))),
      (3L, "text/plain", "not an image at all".getBytes))
      .toDF("doc_id", "media_type", "payload")
    val got = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(got(1L).width === SyntheticImages.Width &&
      got(1L).height === SyntheticImages.Height)
    assert(got(2L).width === 5 && got(2L).height === 7)
    // non-image payloads keep the byte-stub contract (q51's oracle)
    val n = "not an image at all".getBytes.length
    assert(got(3L).width === n % 640 && got(3L).height === n % 480)
  }

  test("pHash over real pixels: re-exposure is near, different images are far") {
    import spark.implicits._
    val media = (1L to 40L).flatMap { id =>
      Seq((id * 2, "image/ppm", SyntheticImages.generate(id)),
        (id * 2 + 1, "image/ppm", SyntheticImages.generate(id, brightness = 12)))
    }.toDF("doc_id", "media_type", "payload")
    val h = Multimodal.perceptualHash(spark, media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val near = (1L to 40L).map(id => ham(h(id * 2), h(id * 2 + 1)))
    assert(near.forall(_ <= 10), s"re-exposed pairs too far: $near")
    val far = (1L until 40L).map(id => ham(h(id * 2), h((id + 1) * 2)))
    // distinct seeds decorrelate: hashes scatter around 32 bits apart
    assert(far.sum.toDouble / far.size > 16.0, s"distinct images too close: $far")
  }

  test("banded near-dup join finds exactly the re-exposed pairs over real images") {
    import spark.implicits._
    // exposure variants adjacent ids; distinct seeds otherwise
    val media = (1L to 15L).flatMap { id =>
      Seq((id * 2, "image/ppm", SyntheticImages.generate(id)),
        (id * 2 + 1, "image/ppm", SyntheticImages.generate(id, brightness = 12)))
    }.toDF("doc_id", "media_type", "payload")
    val pairs = Multimodal.phashNearDupPairs(spark, media, maxHamming = 6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (1L to 15L).map(id => (id * 2, id * 2 + 1)).toSet
    assert((expected -- pairs).isEmpty, s"missed pairs: ${expected -- pairs}")
    // no false positives beyond what the exact hamming trim allows
    assert(pairs.forall { case (a, b) => b == a + 1 && a % 2 == 0 },
      s"unexpected pairs: ${pairs -- expected}")
  }

  test("dimension claims that overflow Int decode to None, not crash or OOM") {
    // a ~50-byte payload claiming billions of pixels: w*h wraps Int to
    // 0 (dodging a naive length check) or n*3 wraps negative (passing
    // it) — both must hit the same None as any other truncation
    def pnm(hdr: String) = hdr.getBytes("US-ASCII") ++ new Array[Byte](32)
    assert(ImageCodec.decode(pnm("P6 65536 65536 255 ")).isEmpty)
    assert(ImageCodec.decode(pnm("P6 30000 30000 255 ")).isEmpty)
    assert(ImageCodec.decode(pnm("P5 2000000000 2 255 ")).isEmpty)
    val huge = ImageCodec.encodeBmp(4, 4, Array.fill(16)(0x808080))
    def putLe32(o: Int, v: Int): Unit = {
      huge(o) = (v & 0xff).toByte; huge(o + 1) = ((v >> 8) & 0xff).toByte
      huge(o + 2) = ((v >> 16) & 0xff).toByte; huge(o + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(18, 0x40000000); putLe32(22, 0x40000000) // 2^30 x 2^30 "BMP"
    assert(ImageCodec.decode(huge).isEmpty)
  }
}
