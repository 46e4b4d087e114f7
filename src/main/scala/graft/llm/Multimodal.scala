package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * payloads with typed metadata, processed per-partition in batches.
  *
  * The Spark-side machinery is real — schema (`binary` payload +
  * metadata struct), partition-friendly batch processing via
  * `mapPartitions` over a typed Dataset (the JVM analogue of
  * Python's `mapInPandas` batch UDF shape: one iterator in, one
  * iterator out, amortizing per-batch setup like a decoder handle),
  * and deterministic feature extraction downstream.
  *
  * The decoder seam is GRADUATED: payloads in the formats
  * [[ImageCodec]] understands (binary PPM/PGM, uncompressed 24-bit
  * BMP) decode to real pixels — real dimensions in features, real
  * luma grids under the DCT hash. Payloads in any other format (and
  * the text-bytes stand-ins the oracle corpus uses) fall back to
  * `decodeStub`'s deterministic byte-derived features, preserving
  * their tested contracts. Audio/video codecs remain out of scope
  * (no codec libraries in the environment).
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                                 checksum: String, width: Int, height: Int)

  /** Wrap the documents table as a media table: payload = UTF-8 bytes
    * of the text (the deterministic stand-in for real image bytes). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image/png").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("source").as("origin"), col("n_chars").as("raw_size"))
        .as("meta"))

  /** STUB decoder: deterministic pseudo-features from payload bytes.
    * A real implementation would open a codec per partition and decode
    * each payload; the iterator-in/iterator-out shape below is exactly
    * where that goes. */
  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    MediaFeatures(r.doc_id, r.media_type, n,
      checksum = md5Hex(r.payload),
      width = (n % 640).toInt,
      height = (n % 480).toInt)
  }

  /** REAL decode when the payload is a recognized image: true raster
    * dimensions; the checksum stays the payload MD5 either way. */
  def decodeFeatures(r: MediaRecord): MediaFeatures =
    ImageCodec.decode(r.payload) match {
      case Some(img) =>
        decodeStub(r).copy(width = img.width, height = img.height)
      case None => decodeStub(r)
    }

  /** Batch feature extraction: one decoder per partition, streamed. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        // per-partition setup (decoder/codec handle) would open here
        it.map(decodeFeatures)
      }
  }

  final case class ResizedMedia(doc_id: Long, media_type: String,
                                payload: Array[Byte], width: Int, height: Int)

  /** STUB resize: a real implementation decodes, scales and re-encodes;
    * the stub strides the payload down to exactly `w*h` bytes (repeating
    * when the source is smaller) so output sizes are verifiable while
    * the batch shape stays the production one. */
  def resizeStub(r: MediaRecord, w: Int, h: Int): ResizedMedia = {
    val target = w * h
    val src = if (r.payload.isEmpty) Array[Byte](0) else r.payload
    val out = Array.tabulate(target)(i => src((i.toLong * src.length / target).toInt))
    ResizedMedia(r.doc_id, r.media_type, out, w, h)
  }

  /** Batch resize: same iterator-in/iterator-out per-partition shape as
    * [[extractFeatures]] — narrow, no shuffle, decoder amortized. */
  def resizeBatch(spark: SparkSession, media: DataFrame,
                  w: Int, h: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions(_.map(resizeStub(_, w, h)))
  }

  /** Luma grid for the hash tiers: real decode + area resample for
    * recognized images, byte-stub fallback otherwise. */
  private def lumaGrid(r: MediaRecord, n: Int): Array[Int] =
    ImageCodec.decode(r.payload) match {
      case Some(img) => ImageCodec.resample(img.gray, img.width, img.height, n, n)
      case None => resizeStub(r, n, n).payload.map(_ & 0xff)
    }

  /** Average-hash tier: resize to 8x8 pixels, threshold each against
    * the mean, pack to a 64-bit hash — the cheap coarse screen ahead
    * of [[dctHash]] (aHash vs pHash, the standard ladder). */
  def averageHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions(_.map { r =>
        val px = lumaGrid(r, 8)
        val mean = px.sum.toDouble / px.length
        val bits = px.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
          if (p >= mean) acc | (1L << i) else acc
        }
        (r.doc_id, bits)
      }).toDF("doc_id", "phash")
  }

  /** pHash DCT grid width: 32x32 luminance in, 8x8 low-frequency out. */
  private val DctN = 32

  /** DCT-II basis, precomputed once per JVM: `cos((2x+1) k pi / 2N)`.
    * `StrictMath` (fdlibm) rather than `Math` so every executor on any
    * JVM/platform computes bit-identical coefficients — hash stability
    * across a heterogeneous cluster is part of the contract. */
  private lazy val dctBasis: Array[Array[Double]] =
    Array.tabulate(DctN, DctN)((k, x) =>
      StrictMath.cos((2 * x + 1) * k * StrictMath.PI / (2.0 * DctN)))

  /** REAL pHash transform (the production algorithm — only pixel
    * acquisition upstream is stubbed): 2D DCT-II of a 32x32 grayscale
    * grid (separable, fixed row-then-column summation order, so the
    * result is deterministic), keep the top-left 8x8 low-frequency
    * block, threshold each coefficient against the block mean
    * EXCLUDING the DC term, pack to 64 bits. Near-identical images —
    * recompressed, lightly cropped, brightness-shifted — agree in most
    * low-frequency signs, so their hashes sit within a small Hamming
    * radius. */
  private[llm] def dctHash(px: Array[Int]): Long = {
    require(px.length == DctN * DctN, s"expected ${DctN * DctN} pixels, got ${px.length}")
    // rows: tmp(r)(k) = sum_x px(r)(x) * basis(k)(x)
    val tmp = Array.ofDim[Double](DctN, DctN)
    var r = 0
    while (r < DctN) {
      var k = 0
      while (k < DctN) {
        var s = 0.0; var x = 0
        while (x < DctN) { s += px(r * DctN + x) * dctBasis(k)(x); x += 1 }
        tmp(r)(k) = s; k += 1
      }
      r += 1
    }
    // cols over the 8 needed output rows only: F(u)(v) = sum_r tmp(r)(v) * basis(u)(r)
    val block = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0; var rr = 0
        while (rr < DctN) { s += tmp(rr)(v) * dctBasis(u)(rr); rr += 1 }
        block(u * 8 + v) = s; v += 1
      }
      u += 1
    }
    var sum = 0.0
    var i = 1
    while (i < 64) { sum += block(i); i += 1 }
    val mean = sum / 63.0
    var bits = 0L
    i = 0
    while (i < 64) { if (block(i) > mean) bits |= 1L << i; i += 1 }
    bits
  }

  /** DCT perceptual fingerprint over the decoded pixels — the media
    * tier of the dedup ladder (simhash is the text analogue). Narrow
    * per-partition map, no shuffle; [[ImageCodec]] supplies real
    * 32x32 luma for recognized images (byte-stub fallback otherwise),
    * [[dctHash]] is the transform. */
  def perceptualHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions(_.map { r =>
        (r.doc_id, dctHash(lumaGrid(r, DctN)))
      }).toDF("doc_id", "phash")
  }

  /** Media near-dup pairs: hash pairs within `maxHamming` bits, with
    * GUARANTEED recall — the 64 hash bits split into `maxHamming + 1`
    * bands, pairs agreeing on ANY whole band become candidates
    * (pigeonhole: ≤ maxHamming differing bits cannot touch all
    * maxHamming+1 bands, so every true pair shares at least one), and
    * the exact popcount trims the rest. Each band join is a bucketed
    * equi join — never all-pairs — and the hash frame feeds both
    * sides of the self-join, so `materialize` (the shared scale-hook
    * pattern) pins the decode+hash stage to ONE corpus pass. */
  def phashNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 6,
                        materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming ($maxHamming)")
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val bandVals = array((0 until nBands).map { b =>
      val lowBit = b * width
      // the last band absorbs the 64 % nBands remainder bits
      val w = if (b == nBands - 1) 64 - lowBit else width
      val mask = if (w == 64) -1L else (1L << w) - 1L
      struct(lit(b).as("band"),
        shiftright(col("phash"), lowBit).bitwiseAND(lit(mask)).as("bv"))
    }: _*)
    val h = materialize(perceptualHash(spark, media))
    val banded = h.select(col("doc_id"), col("phash"),
        explode(bandVals).as("bs"))
      .select(col("doc_id"), col("phash"),
        col("bs.band").as("band"), col("bs.bv").as("bv"))
    val l = banded.select(col("band"), col("bv"),
      col("doc_id").as("a"), col("phash").as("ha"))
    val r = banded.select(col("band"), col("bv"),
      col("doc_id").as("b"), col("phash").as("hb"))
    l.join(r, Seq("band", "bv"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("ha"), col("hb"))
      .distinct() // a pair can agree on several bands
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming").cast("int").as("hamming"))
  }

  final case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Frame sampling for video-like payloads: the payload is treated as
    * consecutive `frameBytes`-sized frames; every `stride`-th frame is
    * emitted as its own row (one-to-many flatMap inside mapPartitions —
    * still narrow; the row explosion happens before the next shuffle,
    * so downstream ops repartition on (doc_id, frame_idx) as needed).
    * A real codec would seek keyframes instead of byte-slicing. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int, stride: Int): Dataset[Frame] = {
    import spark.implicits._
    require(frameBytes > 0 && stride > 0)
    media.select("doc_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        r.payload.grouped(frameBytes).zipWithIndex.collect {
          case (f, i) if i % stride == 0 => Frame(r.doc_id, i, f)
        }
      })
  }
}
