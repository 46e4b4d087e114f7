package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Blanket plan-shape invariants swept across EVERY registered query —
  * the per-query guards in `PlanShapeSpec` pin known-delicate shapes;
  * this sweep catches a scale-killer sneaking into ANY of the 90+
  * registry entries in the future (a refactor that drops a join
  * condition, a new query written with an accidental cartesian).
  *
  * Plans are inspected un-executed (initial physical plan) at
  * sf0.001, so the sweep stays cheap; AQE can only ever REPLACE a
  * join with a cheaper strategy at runtime, never introduce a
  * cartesian that was not in the initial plan.
  */
class RegistrySweepSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.executedPlan match {
            case a: AdaptiveSparkPlanExec => a.toString
            case other => other.toString
          }
          if (plan.toLowerCase.contains("cartesianproduct")) Some(name)
          else None
        } catch {
          case e: Throwable => Some(s"$name (failed to plan: ${e.getMessage})")
        } finally spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
    }
    assert(offenders.isEmpty,
      s"cartesian products (or planning failures) in: $offenders")
  }

  test("every registered query has an oracle entry and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    assert((q -- o).isEmpty, s"queries without oracles: ${q -- o}")
  }

  test("oracle SQL registry passes the HUGEINT lint") {
    assert(OracleLint.violations(SparkEntry.oracleSql).isEmpty)
  }
}
