package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch: keeps the `k`
  * smallest DISTINCT hash values seen, as the aggregation state.
  *
  * This is the bounded-state alternative to `countDistinct` that the
  * built-in operators cannot express: exact distinct shuffles every
  * distinct key (state ∝ cardinality), while this aggregate's partial
  * state is a fixed `k` longs per group — map-side combinable, merge
  * is a bounded sorted-array union, and the per-group network cost at
  * 100 TB is k·8 bytes regardless of cardinality. Spark's own
  * `approx_count_distinct` (HLL++) has the same state bound but its
  * estimate is not reproducible across engines; KMV over an md5-prefix
  * hash is a pure function of the input set, so the estimator
  * `(k-1) · H / h_k` (H = hash-space size, h_k = k-th smallest) is
  * bit-identical in any engine that can sort integers — which keeps
  * the operator DuckDB-oracle-checkable (see
  * [[graft.analytics.EventsQueries.kmvDistinct]]).
  *
  * Input must be a LongType hash uniform on [0, H); the caller picks
  * the hash (the graft queries use the first 12 md5 hex chars: 48 bits
  * — small enough that h_k is exact in a double, so the final division
  * is the only rounding step and IEEE division is exactly rounded).
  * Nulls are ignored (SQL aggregate convention). Output: the sorted
  * ascending array of the ≤k retained values; if fewer than `k`
  * distinct inputs exist the array IS the distinct set and callers use
  * its size as the exact count.
  */
case class KmvSketch(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]]
    with ExpectsInputTypes {

  require(k >= 2, s"kmv_sketch k ($k) must be >= 2 (the estimator divides by k-1)")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[Long],
                     other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  private def offer(buf: java.util.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.remove(buf.last); () } }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}
