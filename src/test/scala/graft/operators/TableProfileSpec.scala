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
