package graft.analytics

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Degenerate-population contracts for the q132 sketch set algebra —
  * the shapes the sf fixtures (which always contain every event type)
  * never exercise. */
class KmvSetOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, String)*) =
    rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, new Timestamp(1700000000000L + i * 1000L), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("absent purchase population: one row, zero estimates, zero intersection") {
    val out = EventsQueries.kmvSetOpsOf(
      ev((1L, "click"), (2L, "click"), (3L, "view"))).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Double]("est_purchase") === 0.0)
    assert(r.getAs[Long]("exact_purchase") === 0L)
    assert(r.getAs[Long]("exact_intersection") === 0L)
    assert(r.getAs[Double]("est_intersection") === 0.0)
    assert(r.getAs[Long]("exact_union") === 2L)
  }

  test("disjoint populations: intersection exact 0, union = sum of sides") {
    val out = EventsQueries.kmvSetOpsOf(
      ev((1L, "click"), (2L, "click"), (10L, "purchase"))).collect()(0)
    assert(out.getAs[Long]("exact_intersection") === 0L)
    assert(out.getAs[Long]("exact_union") === 3L)
    // below k distinct users, every estimate is the exact count
    assert(out.getAs[Double]("est_click") === 2.0)
    assert(out.getAs[Double]("est_purchase") === 1.0)
    assert(out.getAs[Double]("est_union") === 3.0)
    assert(out.getAs[Double]("est_intersection") === 0.0)
  }
}
