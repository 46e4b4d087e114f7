package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** CBO enablement: catalog registration is idempotent and per-dir,
  * ANALYZE lands real row counts in the optimizer's stats, and the
  * CBO child session flips planner flags without touching the parent.
  */
class CatalogStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("registerAndAnalyze gives the optimizer exact row counts") {
    val db = CatalogStats.registerAndAnalyze(spark, dir,
      Seq("nation", "region"), statCols = Map("nation" -> Seq("n_nationkey")))
    val actual = spark.read.parquet(s"$dir/nation.parquet").count()
    assert(CatalogStats.plannedRowCount(spark, db, "nation")
      === Some(BigInt(actual)))
    assert(CatalogStats.plannedRowCount(spark, db, "region").isDefined)
    // idempotent: re-registering the same dir is a no-op, same db
    assert(CatalogStats.registerAndAnalyze(spark, dir, Seq("nation")) === db)
  }

  test("per-directory databases keep locations distinct") {
    assert(CatalogStats.dbFor("/root/testdata/sf0.001")
      !== CatalogStats.dbFor("/root/testdata/sf0.01"))
  }

  test("cboSession flips CBO flags on the child only") {
    val child = CatalogStats.cboSession(spark)
    assert(child.conf.get("spark.sql.cbo.enabled") === "true")
    assert(child.conf.get("spark.sql.cbo.joinReorder.enabled") === "true")
    assert(spark.conf.get("spark.sql.cbo.enabled") === "false")
  }

  test("analyzed tables join correctly through the catalog") {
    val db = CatalogStats.registerAndAnalyze(spark, dir, Seq("nation", "region"))
    val got = CatalogStats.cboSession(spark).sql(
      s"SELECT r_name, COUNT(*) AS n FROM $db.nation " +
        s"JOIN $db.region ON n_regionkey = r_regionkey GROUP BY r_name")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum === spark.read.parquet(s"$dir/nation.parquet").count())
  }
}
