package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as an aggregate: at most `k`
  * (item, counter) pairs of state, ANY item whose true frequency
  * exceeds N/(k+1) is guaranteed present in the result (one-sided —
  * no false negatives; counters may undercount by up to N/(k+1)).
  *
  * This is the candidate-generation half of exact heavy-hitters at
  * corpus scale: a full `groupBy(word).count` shuffles the entire
  * vocabulary (web-scale corpora have billions of token types — the
  * shuffle is the cost), while this aggregate carries a fixed ≤k-entry
  * partial state per partition, merges map-side, and collapses to ONE
  * summary row. A second exact pass counts only the ≤k candidates
  * (see `graft.llm.CorpusOps.heavyHitters`), and the sketch guarantee
  * makes the two-phase result EXACTLY the true heavy-hitter set —
  * deterministic and oracle-checkable even though the intermediate
  * summary itself depends on partition boundaries.
  *
  * Update: present → +1; room → insert at 1; full → decrement every
  * counter (dropping zeros) — the classic MG step. Merge: add the
  * other summary's counters, then if over k entries subtract the
  * (k+1)-th largest counter from all and keep the positive ones —
  * the mergeable-summaries reduction (Agarwal et al., PODS'12),
  * closed under arbitrary merge trees, which is what makes the
  * guarantee hold across Spark's partial/final aggregation plan.
  * Null inputs are ignored. Output: array<struct<item, est>> sorted
  * by item (a canonical presentation — estimates are NOT exact
  * counts and carry no cross-partitioning determinism guarantee;
  * only membership of true-heavy items is guaranteed).
  */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with ExpectsInputTypes {

  require(k >= 1, s"misra_gries k ($k) must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String is arena-backed per input batch — materialize
      val s = v.asInstanceOf[UTF8String].toString
      // missing key unboxes to 0L (never a stored value — counters
      // are >= 1), so get doubles as containsKey
      val cur = buf.get(s)
      if (cur != 0L) buf.put(s, cur + 1L)
      else if (buf.size < k) buf.put(s, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, cur + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from every entry; at
      // most k survive and every counter shrank by the same pivot, so
      // the per-item undercount bounds ADD across merges
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val pivot = counts(counts.length - (k + 1)) // (k+1)-th largest
      decrementAll(buf, pivot)
    }
    buf
  }

  /** Subtract `by` from every counter, removing entries that hit 0. */
  private def decrementAll(buf: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val left = e.getValue - by
      if (left <= 0L) it.remove() else e.setValue(left)
    }
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val items = new Array[String](buf.size)
    buf.keySet().toArray(items)
    java.util.Arrays.sort(items, java.util.Comparator.naturalOrder[String]())
    val out = new Array[Any](items.length)
    var i = 0
    while (i < items.length) {
      out(i) = InternalRow(UTF8String.fromString(items(i)), buf.get(items(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}
