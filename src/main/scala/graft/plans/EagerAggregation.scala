package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.{LongType, DataType}

import graft.sources.dsv2.{JsonlScan, JsonlTable}

/** EAGER AGGREGATION (Yan–Larson partial push-down of aggregates
  * through joins), made SOUND by statistics the engine itself proved:
  *
  * {{{ Aggregate(G, aggs, fact ⋈ dim on fk = pk) }}}
  * rewrites to
  * {{{ Aggregate(G, re-aggs, PartialAgg(fact by fk ∪ G∩fact) ⋈ dim) }}}
  *
  * pre-shrinking the fact side BEFORE the join shuffle — the rewrite
  * Catalyst cannot derive itself (OSS Spark has no aggregate
  * push-through-join), and exactly the hand optimization the
  * DataFrame-twin queries apply that their verbatim-SQL twins forfeit
  * (BASELINE.md round-16: the q196/q03 plan split). At 100 TB the win
  * is the join's shuffle volume: |distinct fk| rows instead of |fact|.
  *
  * SOUNDNESS. The rewrite is only correct when every fact row matches
  * AT MOST ONE dim row (a duplicated pk would multiply a pre-merged
  * group as a unit instead of per-row). No Spark constraint provides
  * that, so the premise comes from the engine's own ANALYZE machinery:
  * `CALL analyze_table(..., unique_candidates => 'pk')` EXACTLY
  * verifies the column duplicate-free over non-null values, and the
  * verification is served through [[JsonlScan.freshUniqueColumns]]
  * ONLY while the table's content fingerprint still matches — any
  * append, delete, or upsert wave silently withdraws the premise and
  * the rule stands down (the same stale-stats conservatism as the CBO
  * stats). Null join keys never match on either shape, so null
  * multiplicity on the pk is irrelevant.
  *
  * Applicability (everything else stands down, untouched):
  *   - INNER join, single equi-key, both sides attribute references;
  *   - the dim side is (Filter/pass-through-Project over) a graft scan
  *     whose join key is fingerprint-fresh verified-unique (filters
  *     and projections preserve uniqueness — subsets stay unique);
  *   - grouping expressions are plain attributes;
  *   - every aggregate is a non-distinct, unfiltered SUM / MIN / MAX /
  *     COUNT whose inputs come from the fact side (COUNT(*) included);
  *   - the fact side is not itself an Aggregate (already pre-shrunk by
  *     hand or by a previous pass).
  *
  * Typing: partial COUNT re-aggregates as SUM (coalesced to 0 to keep
  * the non-null count contract); partial SUM/MIN/MAX re-aggregate with
  * the same function, cast back to the original result type when the
  * two-level fold widens it (decimal sums). Double sums change
  * addition order — the same reordering Spark's own partial
  * aggregation and AQE already perform.
  *
  * Opt-in via `spark.graft.eagerAgg.enabled` (default false). */
case class EagerAggregation(session: SparkSession) extends Rule[LogicalPlan] {

  import EagerAggregation.Done

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get("spark.graft.eagerAgg.enabled", "false").toBoolean)
      return plan
    plan.transformUp {
      // column pruning inserts an attribute-only Project between the
      // Aggregate and the Join — accept and drop it (the rewrite's
      // partial aggregate re-prunes on the next fixed-point pass)
      case agg @ Aggregate(groupings, results,
          join @ Join(_, _, Inner, Some(_), _), _)
          if agg.getTagValue(Done).isEmpty =>
        rewrite(agg, groupings, results, join).getOrElse(agg)
      case agg @ Aggregate(groupings, results,
          Project(pl, join @ Join(_, _, Inner, Some(_), _)), _)
          if agg.getTagValue(Done).isEmpty &&
            pl.forall(_.isInstanceOf[AttributeReference]) =>
        rewrite(agg, groupings, results, join).getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, groupings: Seq[Expression],
                      results: Seq[NamedExpression],
                      join: Join): Option[LogicalPlan] = {
    val cond = join.condition.get
    // single equi-key between attribute references, one from each side
    val (lk, rk) = cond match {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (join.left.outputSet.contains(a) &&
            join.right.outputSet.contains(b)) (a, b)
        else if (join.left.outputSet.contains(b) &&
            join.right.outputSet.contains(a)) (b, a)
        else return None
      case _ => return None
    }
    // which side is the PROVEN-unique dim?
    val (fact, factKey, dim, factIsLeft) =
      if (uniqueOn(join.right, rk)) (join.left, lk, join.right, true)
      else if (uniqueOn(join.left, lk)) (join.right, rk, join.left, false)
      else return None
    // COST GUARD: a broadcast-able dim means the fact side never
    // shuffles for the join — the pre-aggregation would ADD a shuffle
    // instead of replacing one (measured 0.75x at bench scale). The
    // rewrite pays exactly when the join must shuffle: estimate the
    // dim from its own fresh ANALYZE stats (present by construction —
    // uniqueness verification implies stats) and stand down when it
    // fits the broadcast threshold. threshold = -1 (never broadcast)
    // always rewrites.
    val threshold = session.sessionState.conf.autoBroadcastJoinThreshold
    if (threshold >= 0 && dimBytesEstimate(dim).forall(_ <= threshold))
      return None
    if (fact.isInstanceOf[Aggregate]) return None // already pre-shrunk
    // plain-attribute groupings only
    val groupAttrs: Seq[AttributeReference] = groupings.map {
      case a: AttributeReference => a
      case _ => return None
    }
    // every aggregate supported and fact-sided
    val aggExprs: Seq[AggregateExpression] =
      results.flatMap(_.collect { case ae: AggregateExpression => ae })
        .distinct
    if (aggExprs.isEmpty) return None
    aggExprs.foreach { ae =>
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        // LEGACY sums only: TRY/ANSI overflow semantics are not
        // two-level-decomposable (a partial group's overflow-NULL
        // would be silently skipped by the outer SUM where the
        // single-level try_sum returns NULL for the whole group)
        case Sum(e, ctx) if ctx.evalMode == EvalMode.LEGACY &&
            e.references.subsetOf(fact.outputSet) => ()
        case Min(e) if e.references.subsetOf(fact.outputSet) => ()
        case Max(e) if e.references.subsetOf(fact.outputSet) => ()
        case Count(es) if es.forall(_.references.subsetOf(fact.outputSet)) => ()
        case _ => return None
      }
    }
    // the partial: fact grouped by (join key ∪ fact-side group attrs)
    val ga = groupAttrs.filter(a => fact.outputSet.contains(a))
    val partialGroup: Seq[AttributeReference] = (factKey +: ga).distinct
    val pairs: Seq[(AggregateExpression, Alias)] = aggExprs.map { ae =>
      val pf = ae.aggregateFunction match {
        // eval context carried over verbatim (admission pinned it
        // LEGACY) — Sum(child) alone would re-derive the mode from
        // the SESSION conf, changing overflow semantics under ANSI
        case s: Sum => Sum(s.child, s.evalContext)
        case m: Min => Min(m.child)
        case m: Max => Max(m.child)
        case c: Count => Count(c.children)
      }
      ae -> Alias(pf.toAggregateExpression(), s"_eager_${ae.resultId.id}")()
    }
    val partialAgg = Aggregate(partialGroup,
      partialGroup ++ pairs.map(_._2), fact)
    val newJoin =
      if (factIsLeft) join.copy(left = partialAgg)
      else join.copy(right = partialAgg)
    // outer re-aggregation, result types preserved
    def retyped(e: Expression, want: DataType): Expression =
      if (e.dataType == want) e else Cast(e, want)
    val repl: Map[AggregateExpression, Expression] = pairs.map {
      case (ae, al) =>
        val attr = al.toAttribute
        val outer: Expression = ae.aggregateFunction match {
          case s: Sum =>
            retyped(Sum(attr, s.evalContext).toAggregateExpression(),
              ae.dataType)
          case _: Min => retyped(Min(attr).toAggregateExpression(), ae.dataType)
          case _: Max => retyped(Max(attr).toAggregateExpression(), ae.dataType)
          case _: Count => Coalesce(Seq(
            retyped(Sum(attr,
              NumericEvalContext(EvalMode.LEGACY, allowDecimalPrecisionLoss = true))
              .toAggregateExpression(), LongType), Literal(0L)))
        }
        ae -> outer
    }.toMap
    val newResults = results.map(_.transform {
      case ae: AggregateExpression if repl.contains(ae) => repl(ae)
    }.asInstanceOf[NamedExpression])
    val out = Aggregate(groupAttrs, newResults, newJoin)
    out.setTagValue(Done, true)
    Some(out)
  }

  /** Dim size estimate from its fresh ANALYZE stats: rows x a plain
    * per-column width (string avgLen + offset, 8 for numerics).
    * None when no table/stats found — treated as broadcast-able
    * (stand down: without evidence the join shuffles, don't pay). */
  private def dimBytesEstimate(p: LogicalPlan): Option[Long] = {
    @annotation.tailrec
    def tableOf(q: LogicalPlan): Option[JsonlTable] = q match {
      case Filter(_, c) => tableOf(c)
      case Project(_, c) => tableOf(c)
      case r: DataSourceV2Relation => r.table match {
        case t: JsonlTable => Some(t)
        case _ => None
      }
      case _ => None
    }
    for {
      t <- tableOf(p)
      stats <- t.freshTableStats
    } yield {
      val width = t.schema().fields.map { f =>
        f.dataType match {
          case org.apache.spark.sql.types.StringType =>
            stats.cols.get(f.name).flatMap(_.avgLen).getOrElse(20L) + 8L
          case org.apache.spark.sql.types.BooleanType => 1L
          case _ => 8L
        }
      }.sum
      stats.rows * width
    }
  }

  /** The join-key attribute chases (pass-through Projects / Filters)
    * down to a graft scan whose column is fingerprint-fresh
    * verified-unique. Filters and pass-through projections PRESERVE
    * uniqueness (a subset of distinct values is distinct). */
  @annotation.tailrec
  private def uniqueOn(p: LogicalPlan, attr: AttributeReference): Boolean =
    p match {
      case Filter(_, c) => uniqueOn(c, attr)
      case Project(exprs, c) =>
        exprs.find(_.toAttribute.exprId == attr.exprId) match {
          case Some(a: AttributeReference) => uniqueOn(c, a)
          case Some(Alias(a: AttributeReference, _)) => uniqueOn(c, a)
          case _ => false
        }
      // the rule runs in the operator-optimization batch, BEFORE
      // V2ScanRelationPushDown — the relation is still table-shaped;
      // the scan-shaped match covers any later re-optimization pass
      case r: DataSourceV2Relation =>
        r.table match {
          case t: JsonlTable if r.output.exists(_.exprId == attr.exprId) =>
            t.freshUniqueColumns.contains(attr.name)
          case _ => false
        }
      case r: DataSourceV2ScanRelation =>
        r.scan match {
          case js: JsonlScan if r.output.exists(_.exprId == attr.exprId) =>
            js.freshUniqueColumns.contains(attr.name)
          case _ => false
        }
      case _ => false
    }
}

object EagerAggregation {
  /** Re-entry guard: the rewrite's own output is Aggregate-over-Join
    * again; the tag stops the fixed-point optimizer from stacking
    * partials forever (and the structural fact-is-Aggregate check
    * backs it up across plan copies that might drop tags). */
  private[plans] val Done = TreeNodeTag[Boolean]("graft.eagerAgg.done")
}
