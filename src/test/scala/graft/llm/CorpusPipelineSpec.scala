package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The composed curation pipeline: per-input-doc accountability (every
  * doc surfaces exactly once with a status), stage semantics visible
  * through the composite (quality drop, dup drop, contamination
  * drop, split + packing only for kept train docs), and the
  * materialize-hook parity that makes the scale path safe. */
class CorpusPipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodText =
    "the quick brown fox jumps over a lazy dog and runs to the hills " +
      "with many other animals in a long happy parade of friends"

  private def doc(id: Long, text: String) =
    (id, text, "en", "web", text.length.toLong)

  private val docs = Seq(
    doc(1, goodText),
    doc(2, goodText + " extra tail words here"),    // near-dup of 1? distinct enough to survive
    doc(3, goodText),                               // exact dup of 1 -> dropped
    doc(4, "zzzz " * 3),                            // low quality -> dropped
    doc(5, "eval overlap secret benchmark phrase inside a tale of " +
      "mountains rivers and deserts where travelers walk for days and " +
      "the sun is high in the sky and the wind is calm to the end"),
    doc(6, "a completely different story about ships and seas and " +
      "storms that is long enough to pass the quality screen easily " +
      "with the and of to in is words sprinkled throughout the text"))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val evalDocs = Seq(
    (100L, "eval overlap secret benchmark phrase inside the quick"))
    .toDF("doc_id", "text")

  test("every input doc gets exactly one status row; stages attribute drops") {
    val out = CorpusPipeline.curate(docs, evalDocs, qualityThreshold = 1.0,
      dedupThreshold = 0.5).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(out(4L) == "dropped:quality")
    assert(out(3L).startsWith("dropped:") && out(3L).contains("dup"),
      s"exact dup should drop: ${out(3L)}")
    assert(out(5L) == "dropped:contaminated")
    assert(out(1L).startsWith("kept:"))
    assert(out(6L).startsWith("kept:"))
  }

  test("null text reads as a quality drop, never a null status") {
    val withNull = docs.unionByName(
      Seq[(Long, String, String, String, Long)]((7L, null, "en", "web", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = CorpusPipeline.curate(withNull, evalDocs).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out(7L) == "dropped:quality")
    assert(out.values.forall(s => s != null))
  }

  test("bins/offsets only for kept train docs, within capacity") {
    val rows = CorpusPipeline.curate(docs, evalDocs, capacity = 64)
      .collect()
    rows.foreach { r =>
      val status = r.getString(4)
      if (status == "kept:train") {
        assert(!r.isNullAt(6) && !r.isNullAt(7), s"train doc unpacked: $r")
        assert(r.getLong(7) >= 0 && r.getLong(7) < 64)
      } else {
        assert(r.isNullAt(6) && r.isNullAt(7), s"non-train doc packed: $r")
      }
    }
  }

  test("split assignment matches hashSplit on the surviving subset") {
    val out = CorpusPipeline.curate(docs, evalDocs).collect()
      .filter(_.getString(4).startsWith("kept:"))
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    val expected = CorpusOps.hashSplit(docs.filter(col("doc_id")
        .isin(out.keys.toSeq: _*)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == expected)
  }

  test("materialize hook (localCheckpoint) preserves results bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val real = graft.core.Tables.load(spark, dir, "documents")
    val eval = real.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text"))
    val lazyRes = CorpusPipeline.curate(real, eval)
      .orderBy("doc_id").collect().toSeq
    val pinned = CorpusPipeline.curate(real, eval,
        materialize = _.localCheckpoint())
      .orderBy("doc_id").collect().toSeq
    assert(lazyRes == pinned)
    assert(lazyRes.nonEmpty)
  }

  test("bloomDecontam variant is bit-identical to the exact pipeline") {
    val dir = "/root/testdata/sf0.001"
    val real = graft.core.Tables.load(spark, dir, "documents")
    val eval = real.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text"))
    val exact = CorpusPipeline.curate(real, eval)
      .orderBy("doc_id").collect().toSeq
    val bloom = CorpusPipeline.curate(real, eval, bloomDecontam = true)
      .orderBy("doc_id").collect().toSeq
    assert(bloom == exact)
  }
}
