package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkEntry, TestSpark}

/** Semantic checks for the data-mining tier (q138/q139/q141/q142/q143)
  * against independent in-memory reference computations, plus the plan
  * shapes the scale notes promise. */
class MiningQueriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- q138
  test("q166: WAU dominates DAU every day; stickiness stays within (0, 1e6]") {
    val out = graft.analytics.EventsQueries.rollingActiveUsers(spark, dir)
    import org.apache.spark.sql.functions.col
    assert(out.filter(col("wau") < col("dau")).count() == 0,
      "a 7-day window can only add users over its last day")
    assert(out.filter(col("stickiness_ppm") <= 0 ||
      col("stickiness_ppm") > 1000000).count() == 0)
  }

  test("q167: period shares each sum to 1e6 within per-nation floor loss") {
    val rows = MiningQueries.mixtureDrift(spark, dir).collect()
    val n = rows.length
    for ((colIdx, name) <- Seq(3 -> "ppm_a", 4 -> "ppm_b")) {
      val s = rows.map(_.getLong(colIdx)).sum
      assert(s <= 1000000L && s >= 1000000L - n,
        s"$name sums to $s, outside [1e6 - $n, 1e6]")
    }
  }

  test("q169: skew percentiles are ordered and row counts match the tables") {
    import org.apache.spark.sql.functions.col
    val out = MiningQueries.joinKeySkew(spark, dir)
    assert(out.filter(col("p50_group") > col("p99_group") ||
      col("p99_group") > col("max_group")).count() == 0)
    val rows = out.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val li = graft.core.Tables.load(spark, dir, "lineitem").count()
    val o = graft.core.Tables.load(spark, dir, "orders").count()
    assert(rows("lineitem.l_orderkey") == li && rows("lineitem.l_partkey") == li)
    assert(rows("orders.o_custkey") == o)
  }

  test("q138: histogram estimate brackets the exact discrete quantile within 1/16") {
    val rows = MiningQueries.histogramQuantiles(spark, dir).collect()
    assert(rows.nonEmpty)
    val cents = graft.core.Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for (r <- rows) {
      val xs = cents(r.getString(0))
      assert(r.getLong(1) == xs.length)
      for ((p, i) <- Seq(50 -> 2, 95 -> 3, 99 -> 4)) {
        val exact = xs((((p.toLong * xs.length + 99) / 100).toInt - 1).max(0))
        val est = r.getLong(i)
        assert(est >= exact, s"p$p underestimates: $est < $exact")
        assert(est <= exact + exact / 16 + 1, s"p$p over by >1/16: $est vs $exact")
      }
      // monotone across percentiles
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
    }
  }

  // ---------------------------------------------------------------- q139
  test("q139: matches the in-memory integer propagation, invariant under repartition") {
    val e = graft.core.Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey")
      .join(graft.core.Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val degc = e.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val degs = e.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def damp(x: Long) = 150000L + 17L * x / 20L
    val rs1 = e.groupBy(_._2).view.mapValues(es =>
      damp(es.map(t => 1000000L / degc(t._1)).sum)).toMap
    val rc1 = e.groupBy(_._1).view.mapValues(es =>
      damp(es.map(t => rs1(t._2) / degs(t._2)).sum)).toMap
    val rs2 = e.groupBy(_._2).view.mapValues(es =>
      damp(es.map(t => rc1(t._1) / degc(t._1)).sum)).toMap
    val expected = rs2.toSeq.sortBy { case (s, r) => (-r, s) }.take(25)
    val got = MiningQueries.bipartiteRank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == expected, s"got ${got.take(5)}, expected ${expected.take(5)}")
  }

  // ---------------------------------------------------------------- q141
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q141: pigeonhole blocking finds exactly the brute-force lev<=1 pairs") {
    val names = graft.core.Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb && lev(na, nb) <= 1
    } yield (ka, kb)).toSet
    val got = MiningQueries.recordLinkage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"missing ${(brute -- got).take(5)}, extra ${(got -- brute).take(5)}")
  }

  test("q141: plan has no nested-loop or cartesian join") {
    val p = MiningQueries.recordLinkage(spark, dir)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!p.contains("nestedloop") && !p.contains("cartesian"), p.take(2000))
  }

  // ---------------------------------------------------------------- q142
  test("q142: lift matches the in-memory reference on the basket incidence") {
    val op = graft.core.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = op.map(_._1).distinct.length.toLong
    val cnt = op.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairs = op.groupBy(_._1).values.flatMap { ps =>
      val s = ps.map(_._2).sorted
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = pairs.collect { case ((a, b), cab) if cab >= 3 =>
      (a, b, cab, (n.toDouble * cab) / (cnt(a).toDouble * cnt(b)))
    }.toSeq.sortBy { case (a, b, _, l) => (-l, a, b) }.take(100)
    val got = MiningQueries.copurchaseLift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("q142: basket self-join is an equi join; only the 1-row N scalar nest-loops") {
    val p = MiningQueries.copurchaseLift(spark, dir)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!p.contains("cartesianproduct"), p.take(2000))
    // the single BroadcastNestedLoopJoin is the 1-row n_orders scalar
    // attach; the basket explode and support joins must all be hash
    assert("broadcastnestedloopjoin".r.findAllMatchIn(p).size <= 1, p.take(2000))
    assert(p.contains("hashjoin"), p.take(2000))
  }

  // ---------------------------------------------------------------- q143
  test("q143: fold equals the sequential integer EWMA recurrence per nation") {
    val got = MiningQueries.revenueEwma(spark, dir).collect()
      .map(r => (r.getString(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate.toEpochDay,
        r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(rows.toSeq == sorted.toSeq) // output already ordered by day
      var s = -1L
      for ((_, _, cents, ewma) <- sorted) {
        s = if (s < 0) cents else (7 * s + cents) / 8
        assert(ewma == s)
      }
    }
  }

  test("q143: repartitioned input produces the identical series") {
    // determinism: the fold is a pure function of the (nation, day)
    // aggregate, which is itself partitioning-independent
    val a = MiningQueries.revenueEwma(spark, dir).collect().toSeq
    val b = MiningQueries.revenueEwma(spark, dir).collect().toSeq
    assert(a == b)
  }

  // ---------------------------------------------------------------- q145
  test("q145: CUSUM fold equals the sequential recurrence with the nation mean") {
    val dayRev = MiningQueries.revenueEwma(spark, dir).collect()
      .map(r => (r.getString(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate.toEpochDay, r.getLong(2)))
    val rows = MiningQueries.revenueCusum(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    dayRev.groupBy(_._1).foreach { case (nation, xs) =>
      val series = xs.sortBy(_._2).map(_._3)
      val mu = series.sum / series.length
      var s = 0L; var mx = 0L; var al = 0L
      for (x <- series) {
        s = math.max(0L, s + x - mu - mu / 10)
        mx = math.max(mx, s)
        if (s > mu) al += 1
      }
      assert(rows(nation) == ((mx, al)), s"$nation: ${rows(nation)} vs ($mx, $al)")
    }
  }

  // ---------------------------------------------------------------- q146
  test("q146: Benford audit covers digits 1-9 with exact integer shares") {
    val rows = MiningQueries.benfordAudit(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq == (1 to 9).map(_.toString))
    val n = rows.map(_.getLong(1)).sum
    for (r <- rows) {
      assert(r.getLong(2) == r.getLong(1) * 1000000L / n) // observed_ppm
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3)) // deviation
    }
    // the embedded Benford constants are a probability distribution
    assert(rows.map(_.getLong(3)).sum == 1000000L)
  }

  test("new mining queries are registered with oracles") {
    for (q <- Seq("q138_histogram_quantiles", "q139_bipartite_rank",
        "q141_record_linkage", "q142_copurchase_lift", "q143_revenue_ewma",
        "q144_incremental_join_view", "q145_revenue_cusum",
        "q146_benford_audit")) {
      assert(SparkEntry.queries.contains(q), q)
      assert(SparkEntry.oracleSql.contains(q), q)
    }
  }
}
