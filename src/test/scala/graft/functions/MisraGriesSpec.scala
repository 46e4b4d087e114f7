package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The Misra–Gries frequent-items aggregate: the no-false-negatives
  * guarantee (every item with true count > N/(k+1) survives) under
  * vocabulary far larger than k and across many partitions (which
  * exercises serialize/merge and the pivot-subtraction reduction),
  * undercount bounds, the exact small-vocab regime, null handling,
  * and the two-phase exact heavy-hitters pipeline built on it.
  */
class MisraGriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def summary(values: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    val df = values.toDF("w").repartition(parts)
    df.agg(Native.misraGries(col("w"), k).as("mg"))
      .select(explode(col("mg")).as("c"))
      .select(col("c.item"), col("c.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Zipf-ish stream: a few genuinely heavy items buried in a long
    * tail of distinct noise words (vocab >> k, forcing the decrement
    * path and the merge reduction). */
  private val heavy = Map("alpha" -> 4000, "beta" -> 2500, "gamma" -> 1200)
  private val stream: Seq[String] = {
    val hot = heavy.toSeq.flatMap { case (w, n) => Seq.fill(n)(w) }
    val noise = Seq.tabulate(8000)(i => s"tail_${i % 4000}")
    // deterministic interleave (no RNG): stripe hot items through noise
    (hot ++ noise).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003 }
      .map(_._1)
  }

  test("every item above N/(k+1) survives, regardless of partitioning") {
    val n = stream.size
    for (parts <- Seq(1, 7, 32)) {
      val got = summary(stream, k = 49, parts)
      val threshold = n / 50.0
      heavy.foreach { case (w, c) =>
        assert(c > threshold, s"test data: $w must be heavy")
        assert(got.contains(w), s"$w (true $c > N/(k+1)=$threshold) missing at parts=$parts")
      }
    }
  }

  test("estimates never exceed true counts and undercount by at most N/(k+1)") {
    val n = stream.size
    val trueCounts = stream.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val got = summary(stream, k = 49, parts = 13)
    got.foreach { case (w, est) =>
      val t = trueCounts(w)
      assert(est <= t, s"$w overcounted: est $est > true $t")
      assert(t - est <= n / 50 + 1, s"$w undercount ${t - est} exceeds N/(k+1)")
    }
  }

  test("vocab smaller than k: exact counts") {
    val vals = Seq.fill(200)(Seq("a", "a", "b", "c")).flatten
    assert(summary(vals, k = 10, parts = 8) ==
      Map("a" -> 400L, "b" -> 200L, "c" -> 200L))
  }

  test("nulls ignored; all-null group yields empty summary") {
    val df = Seq[(Int, String)]((1, "x"), (1, null), (2, null)).toDF("g", "w")
    val rows = df.groupBy("g")
      .agg(Native.misraGries(col("w"), 4).as("mg"))
      .orderBy("g").collect()
    assert(rows(0).getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)) == Seq("x"))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).isEmpty)
  }

  test("sql-text surface resolves via GraftExtensions") {
    val got = spark.sql(
      "SELECT misra_gries(w, 8) FROM VALUES ('a'),('a'),('b') AS t(w)")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(got.map(_.getString(0)).contains("a"))
  }

  test("two-phase heavyHitters equals the exact GROUP BY result") {
    val docs = stream.grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val got = graft.llm.CorpusOps.heavyHitters(docs, frac = 0.05, sketchK = 49)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val n = stream.size
    val want = stream.groupBy(identity).view
      .mapValues(_.size.toLong)
      .filter { case (_, c) => c >= math.ceil(n * 0.05) }
      .toSeq.sortBy { case (w, c) => (-c, w) }
    assert(got == want)
  }

  test("frac below the sketch guarantee is rejected") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.llm.CorpusOps.heavyHitters(docs, frac = 0.001, sketchK = 100)
    }
  }
}
