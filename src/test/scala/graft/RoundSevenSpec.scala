package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.EventsQueries
import graft.llm.{Dedup, Similarity}

/** Round-7 operator tier: prefix-filter similarity join, binary
  * sign-bit ANN, discrete-hazard retention. */
class RoundSevenSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------- prefix Jaccard

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("prefix filter finds EXACTLY the brute-force Jaccard >= 3/5 pairs") {
    // mix of near-dups, partial overlaps, and disjoint docs
    val docs = docsDf(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown fox jumps over a lazy dog",
      2L -> "the quick brown fox leaps over the lazy dog",
      3L -> "pack my box with five dozen liquor jugs",
      4L -> "pack my box with five dozen liquor jugs today",
      5L -> "entirely unrelated words live here tonight",
      6L -> "the quick brown fox jumps over the lazy dog")
    val got = Dedup.prefixJaccardPairs(docs, p = 3, q = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over distinct word sets
    val sets = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1).split(" ").distinct.toSet).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      union = (sets(a) | sets(b)).size
      if inter * 5 >= union * 3
    } yield (a, b)).toSet
    assert(want.nonEmpty && want.contains((0L, 6L)))
    assert(got === want)
    // reported counts are the exact set sizes
    val row06 = Dedup.prefixJaccardPairs(docs, 3, 5)
      .filter(col("a") === 0 && col("b") === 6).head()
    assert(row06.getAs[Long]("inter_sz") === sets(0L).size)
    assert(row06.getAs[Long]("union_sz") === sets(0L).size)
  }

  test("prefix filter: threshold is the exact rational, not a float boundary") {
    // |A|=|B|=4, inter=3, union=5 -> J = 3/5 exactly: must be included
    val docs = docsDf(
      0L -> "w1 w2 w3 w4",
      1L -> "w1 w2 w3 w5")
    val got = Dedup.prefixJaccardPairs(docs, p = 3, q = 5).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("inter_sz") === 3L)
    assert(got.head.getAs[Long]("union_sz") === 5L)
    // and J = 2/6 < 3/5 stays out
    val out = Dedup.prefixJaccardPairs(docsDf(
      0L -> "w1 w2 w3 w4",
      1L -> "w1 w2 w6 w7"), 3, 5).collect()
    assert(out.isEmpty)
  }

  test("saturation guard aborts before the candidate join, naming the ladder") {
    // 8 near-identical docs: every pair is a candidate, C(8,2)=28 > cap
    val docs = docsDf((0L to 7L).map(i =>
      i -> s"alpha beta gamma delta epsilon zeta token$i"): _*)
    val e = intercept[IllegalStateException](
      Dedup.prefixJaccardPairs(docs, 3, 5, maxCandidatePairs = 10L).collect())
    assert(e.getMessage.contains("saturation guard"))
    assert(e.getMessage.contains("LSH"))
    // a cap above the bound lets the identical corpus through
    val ok = Dedup.prefixJaccardPairs(docs, 3, 5, maxCandidatePairs = 10000L)
    assert(ok.count() === 28L)
  }

  test("candidate_pairs surfaces as an observed metric on every run") {
    val docs = docsDf(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown fox jumps over a lazy dog",
      2L -> "pack my box with five dozen liquor jugs")
    @volatile var seen: Option[Long] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get("prefix_jaccard")
          .foreach(r => seen = Some(r.getAs[Long]("candidate_pairs")))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Dedup.prefixJaccardPairs(docs, 3, 5).collect()
      // the listener fires asynchronously after the action
      val deadline = System.nanoTime() + 10_000_000_000L
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      // docs 0/1 share prefix tokens; doc 2 shares nothing rare
      assert(seen.contains(1L), s"observed=$seen")
    } finally spark.listenerManager.unregister(listener)
  }

  // ------------------------------------------------- binary sign ANN

  test("sign packing: known bit patterns, dims beyond 32 span words") {
    // 35 dims: positives at 0, 2, 33, 34 -> word0 = 1 + 4, word1 = 2 + 4
    val v = Array.tabulate(35)(i =>
      if (Set(0, 2, 33, 34).contains(i)) 1.0f else -1.0f)
    val got = Seq((0L, v)).toDF("vec_id", "embedding")
      .select(expr(Similarity.signWordsExpr("embedding")).as("w"))
      .head().getSeq[Long](0)
    assert(got === Seq(5L, 6L))
    // zero is NOT positive (ties quantize to 0-bit in both engines)
    val z = Seq((0L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
      .select(expr(Similarity.signWordsExpr("embedding")).as("w"))
      .head().getSeq[Long](0)
    assert(z === Seq(2L))
  }

  test("binary hamming ANN: clone ranks first at hamming 0; rerank is exact cosine") {
    val base = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val flipped = base.map(x => -x)
    val near = base.zipWithIndex.map { case (x, i) => if (i < 4) -x else x }
    val e = Seq(
      (0L, base), (1L, base.map(x => x * 2.0f)), // same signs as 0
      (2L, near),                                 // 4 sign flips
      (3L, flipped),                              // 64 flips
      (4L, base.map(x => x * 0.5f)))              // same signs as 0
      .toDF("vec_id", "embedding")
    val rows = Similarity.binaryHammingTopK(e, Seq(0L), k = 3, mult = 1)
      .orderBy("rank").collect()
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 4L, 2L))
    assert(rows.take(2).forall(_.getAs[Long]("hamming") === 0L))
    assert(rows(2).getAs[Long]("hamming") === 4L)
    // scaled copies have cosine 1.0 with the query
    assert(rows.take(2).forall(_.getAs[Double]("cos_sim") === 1.0))
  }

  // -------------------------------------------- discrete hazard table

  test("retention hazard: censoring, at-risk reverse cumsum, exact ppm") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")
    // horizon end = day 30; censored = last activity within 7 days of it
    val events = Seq(
      (1L, ts(1)), (1L, ts(3)),    // age 2, churned (last seen day 3)
      (2L, ts(1)), (2L, ts(3)),    // age 2, churned
      (3L, ts(2)), (3L, ts(10)),   // age 8, churned
      (4L, ts(1)), (4L, ts(28)),   // age 27, censored (within 7 of day 30)
      (5L, ts(30))                 // age 0, censored — defines the horizon
    ).toDF("user_id", "ts")
    val rows = EventsQueries.retentionHazardFrom(events)
      .collect().map(r => (r.getAs[Int]("age_days"), r.getAs[Long]("n_at_risk"),
        r.getAs[Long]("n_churned"), r.getAs[Long]("n_censored"),
        r.getAs[Long]("hazard_ppm")))
    assert(rows.toSeq === Seq(
      (0, 5L, 0L, 1L, 0L),          // everyone reaches age 0; user 5 censored
      (2, 4L, 2L, 0L, 500000L),     // users 1,2 churn at 2 of 4 still at risk
      (8, 2L, 1L, 0L, 500000L),     // user 3 churns at 8 of remaining 2
      (27, 1L, 0L, 1L, 0L)))        // user 4 censored, never counted as churn
  }
}
