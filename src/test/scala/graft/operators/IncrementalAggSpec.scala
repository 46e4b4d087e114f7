package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Incremental aggregate maintenance: merging partial aggregates must
  * equal the full recompute for every decomposable measure, including
  * when the same group key appears in both sides and across arbitrary
  * split points; non-decomposable measures are rejected.
  */
class IncrementalAggSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val measures = Map("n" -> "sum", "total" -> "sum",
    "lo" -> "min", "hi" -> "max")

  private def rows(seed: Int, n: Int) =
    Seq.tabulate(n) { i =>
      val k = (i * 31 + seed) % 7
      (s"k$k", 1L, ((i * 13 + seed) % 1000).toLong,
        ((i * 7) % 100).toLong, ((i * 17 + seed) % 100).toLong)
    }.toDF("key", "n", "total", "lo", "hi")

  test("merge(prev, delta) == full recompute, overlapping keys, any split") {
    val all = rows(1, 500)
    val full = IncrementalAgg.aggregate(all, Seq("key"), measures)
      .orderBy("key").collect().toSeq
    Seq(0, 1, 137, 499, 500).foreach { split =>
      val prev = IncrementalAgg.aggregate(all.limit(split), Seq("key"), measures)
      val delta = IncrementalAgg.aggregate(
        all.exceptAll(all.limit(split)), Seq("key"), measures)
      val merged = IncrementalAgg.merge(prev, delta, Seq("key"), measures)
        .orderBy("key").collect().toSeq
      assert(merged == full, s"split at $split")
    }
  }

  test("three-way fold (day-by-day refresh) still equals full") {
    val parts = Seq(rows(2, 200), rows(3, 150), rows(4, 250))
    val full = IncrementalAgg.aggregate(
      parts.reduce(_ unionByName _), Seq("key"), measures)
      .orderBy("key").collect().toSeq
    val folded = parts.map(IncrementalAgg.aggregate(_, Seq("key"), measures))
      .reduce(IncrementalAgg.merge(_, _, Seq("key"), measures))
      .orderBy("key").collect().toSeq
    assert(folded == full)
  }

  test("non-decomposable measure spec is rejected") {
    intercept[IllegalArgumentException] {
      IncrementalAgg.aggregate(rows(5, 10), Seq("key"), Map("total" -> "avg"))
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.aggregate(rows(5, 10), Seq("key"), Map.empty)
    }
  }
}
