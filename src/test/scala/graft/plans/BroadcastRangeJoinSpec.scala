package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.TestSpark

/** The broadcast range join physical operator: plan claim, row parity
  * with the nested-loop plan (boundaries, strict bounds, nulls, NaN,
  * inverted/degenerate intervals, duplicates), point-on-right,
  * downstream-exchange safety, and the eligibility guards (conf off,
  * equi joins, oversized interval side). */
class BroadcastRangeJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Enabled = "spark.graft.rangeJoin.broadcast"

  private def withStrategy[T](body: => T): T =
    try { spark.conf.set(Enabled, "true"); body }
    finally spark.conf.unset(Enabled)

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val points = (0L to 300L).map(i => (i, i % 53)).toDF("pid", "v")
  private val intervals = Seq[(Long, java.lang.Double, java.lang.Double)](
    (0L, 0.0, 10.0),
    (1L, 9.0, 11.0),
    (2L, 25.0, 25.0),          // degenerate single point
    (3L, 40.0, 30.0),          // inverted: matches nothing
    (4L, null, 10.0),          // null bound: matches nothing
    (5L, Double.NaN, 12.0),    // NaN bound: matches nothing
    (6L, 48.0, 52.0),
    (7L, 0.0, 52.0),           // wide interval overlapping others
    (8L, 9.0, 11.0))           // duplicate of iid=1
    .toDF("iid", "lo", "hi")

  private def naive(p: DataFrame, i: DataFrame) =
    p.join(i, p("v") >= i("lo") && p("v") <= i("hi"))

  private def pairs(df: DataFrame): Seq[(Long, Long)] =
    df.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("claims the plan and matches the nested-loop rows exactly") {
    val expected = pairs(naive(points, intervals))
    assert(expected.nonEmpty)
    withStrategy {
      val df = naive(points, intervals)
      assert(planOf(df).contains("BroadcastRangeJoin"), planOf(df))
      assert(pairs(df) == expected)
    }
  }

  test("survives a downstream exchange (UnsafeRow contract)") {
    val expected = naive(points, intervals).groupBy("iid").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    withStrategy {
      val got = naive(points, intervals).groupBy("iid").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  test("strict bounds and extra conjuncts keep exact semantics") {
    val cond = points("v") > intervals("lo") &&
      points("v") < intervals("hi") && points("pid") % 3 === 0
    val expected = pairs(points.join(intervals, cond))
    withStrategy {
      val df = points.join(intervals, cond)
      assert(planOf(df).contains("BroadcastRangeJoin"))
      assert(pairs(df) == expected)
    }
  }

  test("point side on the RIGHT preserves output column order") {
    val expected = intervals.join(points,
      points("v") >= intervals("lo") && points("v") <= intervals("hi"))
    val expectedRows = pairs(expected)
    val expectedCols = expected.columns.toSeq
    withStrategy {
      val df = intervals.join(points,
        points("v") >= intervals("lo") && points("v") <= intervals("hi"))
      assert(planOf(df).contains("BroadcastRangeJoin"))
      assert(df.columns.toSeq == expectedCols)
      assert(pairs(df) == expectedRows)
    }
  }

  test("null probe values emit nothing") {
    val p = Seq[(Long, java.lang.Long)]((1L, 5L), (2L, null)).toDF("pid", "v")
    withStrategy {
      val df = naive(p, intervals)
      assert(pairs(df).forall(_._1 == 1L))
    }
  }

  test("does not claim equi joins or run when disabled") {
    withStrategy {
      val eq = points.join(intervals,
        points("v") === intervals("iid") && points("v") >= intervals("lo"))
      assert(!planOf(eq).contains("BroadcastRangeJoin"))
    }
    val off = naive(points, intervals)
    assert(!planOf(off).contains("BroadcastRangeJoin"))
  }

  test("falls back when the interval side exceeds the broadcast threshold") {
    withStrategy {
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        val df = naive(points, intervals)
        assert(!planOf(df).contains("BroadcastRangeJoin"))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
  }
}
