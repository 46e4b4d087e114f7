package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** DISTINCT elimination by PROVEN uniqueness: rewrites
  * `COUNT(DISTINCT x)` / `SUM(DISTINCT x)` to their non-distinct
  * forms when every value of `x` appears in at most one input row of
  * the aggregate ([[UniquenessEvidence.outputUnique]]) — each
  * non-null value is then its own distinct class, so the dedup set is
  * pure overhead.
  *
  * The payoff compounds with [[EagerAggregation]]: its pre-shrunk
  * partial aggregate keys the fact by the join key, making that key
  * output-unique, so a q196-class `COUNT(DISTINCT o_orderkey)` over
  * the rewritten join collapses to a plain count — which drops the
  * aggregate from TWO distinct groups (planned as Expand×3 over the
  * input) to one (planned Expand-free). That is exactly the
  * countDistinct→count(*) collapse the hand-written q03 twin applies
  * with human reasoning; here the optimizer derives it from the same
  * ANALYZE-verified uniqueness evidence, fingerprint-fresh. At 100 TB
  * the Expand×3 over fact-grain rows is the single largest CPU term
  * in the unrewritten plan.
  *
  * Soundness notes:
  *   - only single-ATTRIBUTE distinct inputs collapse (the evidence
  *     speaks about attributes);
  *   - FILTER (WHERE ...) clauses survive untouched — a filtered
  *     subset of a duplicate-free column stays duplicate-free;
  *   - MIN/MAX(DISTINCT) are already distinct-insensitive and Spark
  *     normalizes them itself; AVG(DISTINCT) and friends are NOT
  *     collapsible this way (left alone).
  *
  * Shares the `spark.graft.eagerAgg.enabled` opt-in: both rewrites
  * ride the same verified-uniqueness evidence and freshness
  * discipline. */
case class DistinctCollapse(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get("spark.graft.eagerAgg.enabled", "false").toBoolean)
      return plan
    plan.transformUp {
      case agg @ Aggregate(_, results, child, _)
          if results.exists(_.exists {
            case ae: AggregateExpression => collapsible(ae, child)
            case _ => false
          }) =>
        agg.copy(aggregateExpressions = results.map(_.transform {
          case ae: AggregateExpression if collapsible(ae, child) =>
            ae.copy(isDistinct = false)
        }.asInstanceOf[NamedExpression]))
    }
  }

  private def collapsible(ae: AggregateExpression,
                          child: LogicalPlan): Boolean =
    ae.isDistinct && (ae.aggregateFunction match {
      case Count(Seq(a: AttributeReference)) =>
        UniquenessEvidence.outputUnique(session, child, a)
      case Sum(a: AttributeReference, _) =>
        UniquenessEvidence.outputUnique(session, child, a)
      case _ => false
    })
}
