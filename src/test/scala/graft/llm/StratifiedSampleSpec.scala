package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Deterministic stratified sampling: rate honoring within binomial
  * tolerance, stability across runs/partitionings, salt independence,
  * the rate-0 / rate-1 edges, and the zero-shuffle plan contract.
  */
class StratifiedSampleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")

  test("per-stratum rates honored within binomial tolerance") {
    val rates = Map("en" -> 0.5, "zh" -> 0.3)
    val got = CorpusOps.stratifiedSample(docs, rates, defaultRate = 0.1)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, n) =>
      val rate = rates.getOrElse(lang, 0.1)
      val kept = got.getOrElse(lang, 0L).toDouble
      val sd = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(kept - n * rate) <= 4 * sd + 1,
        s"$lang: kept $kept of $n at rate $rate")
    }
  }

  test("sample is a pure function of (id, salt): partitioning-stable") {
    val rates = Map("en" -> 0.4)
    val a = CorpusOps.stratifiedSample(docs, rates, 0.2)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = CorpusOps.stratifiedSample(docs.repartition(13), rates, 0.2)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    val other = CorpusOps.stratifiedSample(docs, rates, 0.2, salt = "other")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a != other, "a different salt must draw a different sample")
  }

  test("rate 0 keeps nothing; rate 1 keeps everything (sentinel threshold)") {
    val none = CorpusOps.stratifiedSample(docs, Map.empty, defaultRate = 0.0)
    assert(none.count() == 0)
    val all = CorpusOps.stratifiedSample(docs, Map("en" -> 1.0), defaultRate = 1.0)
    assert(all.count() == docs.count())
  }

  test("rates outside [0, 1] are rejected") {
    intercept[IllegalArgumentException] {
      CorpusOps.hexThreshold(1.5)
    }
  }

  test("the filter is a narrow map: zero shuffle exchanges") {
    val df = CorpusOps.stratifiedSample(docs, Map("en" -> 0.5), 0.1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("exchange"),
      s"stratified sampling must never shuffle the corpus:\n$plan")
  }
}
