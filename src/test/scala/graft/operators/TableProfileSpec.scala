package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** One-pass profiler: hand-computed nulls/distincts/extrema over a
  * mixed-type frame, numeric-only min/max, single-scan plan. */
class TableProfileSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profiles nulls, exact distincts, and numeric extrema per column") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 2.5), (2L, "a", -1.0), (3L, null, 4.0), (null, "b", null))
      .toDF("id", "s", "x")
    val got = TableProfile.profile(df).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5))))).toMap
    assert(got("id") === ((4L, 1L, 3L, Some(1.0), Some(3.0))))
    assert(got("s") === ((4L, 1L, 2L, None, None)))
    assert(got("x") === ((4L, 1L, 3L, Some(-1.0), Some(4.0))))
  }

  test("profileApprox: no Expand in the plan, estimates near truth, exact below k") {
    val df = (1L to 5000L).map(i => (i, s"v${i % 37}", i * 1.01))
      .toDF("id", "s", "x")
    val prof = TableProfile.profileApprox(df, k = 64)
    // the whole point: a plain aggregate, never the x(columns+1) Expand
    val plan = prof.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"plan:\n$plan")
    val got = prof.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // s has 37 < k distincts: the sketch degenerates to the EXACT count
    assert(got("s") === ((5000L, 0L, 37.0)))
    // id has 5000 distincts: KMV estimate within 35% at k=64 (rel err
    // ~ 1/sqrt(k-2) ≈ 13%; 35% bounds the tail deterministically for
    // this fixed input)
    val est = got("id")._3
    assert(est > 5000 * 0.65 && est < 5000 * 1.35, s"est=$est")
  }

  test("reads the table exactly once (single scan under the Expand)") {
    val df = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val profiled = TableProfile.profile(df)
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val scans = profiled.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.mkString(",")
        case _ => ""
      }
    }.count(_.contains("orders.parquet"))
    assert(scans == 1)
    assert(profiled.count() == df.columns.length.toLong)
  }
}
