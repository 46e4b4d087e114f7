package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the `k` best (ord, payload) pairs
  * per group, ordered by `ord` DESC with ties broken by `payload` ASC
  * — a total order, so the result is deterministic and
  * oracle-checkable against a `ROW_NUMBER() OVER (ORDER BY ord DESC,
  * payload)` window.
  *
  * This is the aggregate Spark lacks between `max_by` (k = 1) and a
  * window sort (k = all): `row_number` shuffles and sorts EVERY row of
  * every group — at 100 TB the sort dominates even though all but k
  * rows per group are discarded. This aggregate's partial state is a
  * fixed ≤k pairs per group: map-side combinable, merge is a bounded
  * sorted union, and only k·16 bytes per group cross the network.
  *
  * `ord` and `payload` are LongType (callers encode decimals as
  * unscaled longs — see q85 — and re-scale after; a generic-typed
  * variant would pay per-row boxing in the hot loop for no additional
  * oracle coverage). Payloads are expected UNIQUE per group (they are
  * keys); a duplicate (ord, payload) pair collapses. Rows where either
  * input is null are ignored. Output: array<struct<ord, payload>>,
  * best first.
  */
case class TopKBy(ord: Expression, payload: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
    with ExpectsInputTypes {

  require(k >= 1, s"topk_by k ($k) must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by"
  override def children: Seq[Expression] = Seq(ord, payload)

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](TopKBy.BestFirst)

  override def update(buf: java.util.TreeSet[(Long, Long)],
                      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val o = ord.eval(input)
    val p = payload.eval(input)
    if (o != null && p != null)
      offer(buf, (o.asInstanceOf[Long], p.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long)],
                     other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  private def offer(buf: java.util.TreeSet[(Long, Long)], v: (Long, Long)): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (TopKBy.BestFirst.compare(v, buf.last) < 0) {
      if (buf.add(v)) { buf.remove(buf.last); () }
    }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (o, p) = it.next()
      out(i) = InternalRow(o, p)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (o, p) = it.next(); bb.putLong(o); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(ord = newChildren.head, payload = newChildren(1))
}

object TopKBy {
  /** Best-first total order — ord DESC, ties payload ASC. An explicit
    * serializable comparator: a Scala `Ordering.by` lambda loses its
    * captured tuple ordering under the Java serialization Spark uses
    * to ship the aggregate to executors. */
  object BestFirst extends java.util.Comparator[(Long, Long)] with Serializable {
    override def compare(a: (Long, Long), b: (Long, Long)): Int =
      if (a._1 != b._1) java.lang.Long.compare(b._1, a._1)
      else java.lang.Long.compare(a._2, b._2)
  }
}
