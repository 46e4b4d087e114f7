package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-7 mining tier: forward-fill carry, rendezvous routing,
  * merged rolling KMV, Theil–Sen trend. Each query's exactness is
  * oracle-gated; these pin the SEMANTIC invariants the oracle's
  * value-compare can't express. */
class RoundEightSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q189: staleness is 0 exactly on active days, -1 only before first") {
    val rows = MiningQueries.forwardFillRevenue(spark, sf)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // active <=> staleness 0; gaps carry a positive age or the -1 head
    rows.foreach { case (d, filled, stale, active) =>
      if (active == 1L) assert(stale == 0L, d)
      else assert(stale > 0L || stale == -1L, d)
      if (stale == -1L) assert(filled == 0L, d)
    }
    // the carry never invents revenue: every filled value re-occurs on
    // the most recent active day at or before it
    val activeVals = rows.filter(_._4 == 1L).map(r => (r._1, r._2))
    rows.filter(r => r._3 > 0L).foreach { case (d, filled, stale, _) =>
      val last = activeVals.takeWhile(_._1 <= d).lastOption
      assert(last.exists(_._2 == filled), s"$d carries $filled")
    }
  }

  test("q190: scaling 5->6 workers moves only the new worker's keys") {
    val rows = MiningQueries.rendezvousRouting(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    rows.foreach { case (w, n, moved) =>
      if (w < 5L) assert(moved == 0L, s"worker $w gained moved keys")
      else assert(moved == n, "new worker must gain only moved keys")
    }
    val total = rows.map(_._2).sum
    val docs = graft.core.Tables.load(spark, sf, "documents").count()
    assert(total == docs)
    // ~1/6 of keys move; allow wide slack at this scale
    val movedShare = rows.map(_._3).sum.toDouble / total
    assert(movedShare > 0.05 && movedShare < 0.35, movedShare.toString)
  }

  test("q191: sketch estimate tracks exact rolling WAU within KMV error") {
    val rows = MiningQueries.rollingKmvWau(spark, sf)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (exact, est, errPpm) =>
      assert(exact > 0L)
      // k=64 => sigma ~ 12.6%; 4 sigma guard
      assert(errPpm <= 500000L, s"exact=$exact est=$est err=$errPpm")
      // small windows (< k distinct) must be answered exactly
      if (exact < 64L) assert(est == exact.toDouble)
    }
  }

  test("q192: rank-selected median equals brute force over all pair slopes") {
    import org.apache.spark.sql.functions._
    import graft.functions.Exact.dec
    val daily = graft.core.Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((sum(dec(col("o_totalprice"), 12, 2)) * 100).cast("long").as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(j)._2 - daily(i)._2).toDouble /
        (daily(j)._1 - daily(i)._1).toDouble).sorted
    val want = slopes((slopes.length + 1) / 2 - 1) // lower median, 1-based rank
    val row = MiningQueries.theilSenTrend(spark, sf).collect().head
    assert(row.getDouble(0) == want)
    assert(row.getLong(1) == slopes.length.toLong)
    assert(row.getLong(2) == daily.length.toLong)
  }
}
