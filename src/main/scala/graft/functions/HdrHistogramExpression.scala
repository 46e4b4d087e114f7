package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Log₂-binned histogram with 4 mantissa bits (HdrHistogram shape) as
  * a mergeable aggregate — the CONSTANT-STATE quantile sketch behind
  * q138, packaged so streaming state stores and map-side partials can
  * carry it: ≤ ~16·60+16 (bucket → count) entries per group no matter
  * how many rows stream through, merge = per-bucket addition (closed
  * under arbitrary merge trees, so the result is a pure function of
  * the input bag — partitioning/merge order cannot change it).
  *
  * Bucketing is IDENTICAL to q138's relational form (the spec pins
  * equality): values < 16 are exact buckets; otherwise with
  * `xp = ⌊log₂ v⌋` and mantissa `m = (v >> (xp−4)) & 15` the bucket is
  * `xp·16 + m` and its upper edge `((m+17) << (xp−4)) − 1` — ≤ 6.25 %
  * relative error at any scale. Output is the histogram itself,
  * `array<struct<bucket, hi, cnt>>` sorted by bucket; quantile
  * extraction is a downstream fold over the ≤ ~1k-entry array
  * ([[Native.histogramQuantile]]), so one aggregate serves any set of
  * percentiles.
  *
  * Inputs must be non-negative (a latency/money-cents domain);
  * negative values fail fast rather than silently mis-binning. Nulls
  * are ignored. */
case class HdrHistogram(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Integer, Long]]
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("hi", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hdr_histogram"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.HashMap[Integer, Long] =
    new java.util.HashMap[Integer, Long]()

  override def update(buf: java.util.HashMap[Integer, Long],
                      input: InternalRow): java.util.HashMap[Integer, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      require(x >= 0L, s"hdr_histogram input must be non-negative, got $x")
      val b = HdrHistogram.bucketOf(x)
      // missing key unboxes to 0L (counts are >= 1, never stored as 0)
      val cur: Long = buf.get(b)
      buf.put(b, cur + 1L)
    }
    buf
  }

  override def merge(buf: java.util.HashMap[Integer, Long],
                     other: java.util.HashMap[Integer, Long]): java.util.HashMap[Integer, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur: Long = buf.get(e.getKey)
      buf.put(e.getKey, cur + e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.HashMap[Integer, Long]): Any = {
    val buckets = new Array[Integer](buf.size)
    buf.keySet().toArray(buckets)
    java.util.Arrays.sort(buckets, java.util.Comparator.naturalOrder[Integer]())
    val out = new Array[Any](buckets.length)
    var i = 0
    while (i < buckets.length) {
      val b = buckets(i).intValue
      out(i) = InternalRow(b.toLong, HdrHistogram.upperEdge(b), buf.get(buckets(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[Integer, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeInt(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Integer, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getInt, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrHistogram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrHistogram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HdrHistogram =
    copy(child = newChildren.head)
}

object HdrHistogram {
  /** q138's bucket function, bit for bit. */
  def bucketOf(v: Long): Int =
    if (v < 16L) v.toInt
    else {
      val xp = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val m = ((v >> (xp - 4)) & 15L).toInt
      xp * 16 + m
    }

  /** Largest value mapping to `bucket` (q138's `hi`). */
  def upperEdge(bucket: Int): Long =
    if (bucket < 16) bucket.toLong
    else {
      val xp = bucket / 16
      val m = bucket % 16
      ((m + 17L) << (xp - 4)) - 1L
    }
}
