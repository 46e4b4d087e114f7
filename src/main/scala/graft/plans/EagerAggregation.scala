package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.{DataType, LongType}

import graft.operators.CatalogStats
import graft.sources.dsv2.{JsonlScan, JsonlTable}

/** EAGER AGGREGATION (Yan–Larson partial push-down of aggregates
  * through joins), made SOUND by statistics the engine itself proved:
  *
  * {{{ Aggregate(G, aggs, fact ⋈ dim on fk = pk) }}}
  * rewrites to
  * {{{ Aggregate(G, re-aggs, PartialAgg(fact by fk ∪ G∩fact ∪ D∩fact) ⋈ dim) }}}
  *
  * pre-shrinking the fact side BEFORE the join shuffle — the rewrite
  * Catalyst cannot derive itself (OSS Spark has no aggregate
  * push-through-join), and exactly the hand optimization the
  * DataFrame-twin queries apply that their verbatim-SQL twins forfeit
  * (BASELINE.md round-16: the q196/q03 plan split). At 100 TB the win
  * is the join's shuffle volume — |distinct fk| rows instead of
  * |fact| — and, for multi-distinct aggregates, the Expand fan-out:
  * Spark plans n≥2 distinct groups as Expand×(n+1) over its input, so
  * pre-shrinking the input is an n+1-fold CPU cut on the whole
  * aggregation path.
  *
  * SOUNDNESS. The rewrite is only correct when every fact row matches
  * AT MOST ONE dim row (a duplicated pk would multiply a pre-merged
  * group as a unit instead of per-row). No Spark constraint provides
  * that, so the premise comes from the engine's own ANALYZE machinery:
  *   - graft-catalog tables: `CALL analyze_table(...,
  *     unique_candidates => 'pk')` EXACTLY verifies the column
  *     duplicate-free, served through [[JsonlScan.freshUniqueColumns]]
  *     ONLY while the table's content fingerprint matches;
  *   - path-based parquet relations (temp views over external files —
  *     the suite's SQL-text twins): [[CatalogStats.verifyUnique]] runs
  *     the same exact probe and serves it through
  *     [[CatalogStats.freshUniqueColumns]] under a file-set
  *     fingerprint (name+length+mtime).
  * Either channel silently withdraws the premise when content moves —
  * the same stale-stats conservatism as the CBO stats. Null join keys
  * never match on either shape, so null multiplicity on the pk is
  * irrelevant.
  *
  * Aggregate classification (everything else stands down, untouched):
  *   - PARTIALIZED: non-distinct, unfiltered SUM (LEGACY eval mode) /
  *     MIN / MAX / COUNT whose inputs are fact-side (COUNT(*)
  *     included) — computed per partial group below the join,
  *     re-folded above (COUNT re-aggregates as SUM coalesced to 0;
  *     two-level folds cast back when they widen the type).
  *   - FREE: aggregates that are DUPLICATE-INSENSITIVE and therefore
  *     survive the fact-side pre-grouping verbatim:
  *       - any supported DISTINCT aggregate — its fact-side inputs
  *         must be plain attributes (they join the pre-group key, so
  *         their value sets per outer group are preserved exactly);
  *         dim-side inputs are free as-is, being functionally
  *         dependent on the join key, which is in the pre-group key;
  *       - non-distinct MIN/MAX over dim-side inputs (same
  *         functional-dependence argument).
  *     Free aggregates are left untouched in the outer aggregate.
  *   - anything else (AVG, filtered aggs, TRY/ANSI sums, non-distinct
  *     SUM/COUNT over dim columns, inputs mixing the two sides):
  *     stand down.
  *
  * Applicability: INNER join, single equi-key, both sides attribute
  * references; proven-unique dim key (above); plain-attribute
  * groupings; the fact side not already an Aggregate.
  *
  * COST GUARD: a broadcast-able dim means the fact side never shuffles
  * for the join — the pre-aggregation would ADD a shuffle instead of
  * replacing one (measured 0.75x at bench scale), so the rule stands
  * down... UNLESS the aggregate carries n≥2 distinct groups: those
  * plan as Expand×(n+1) over the aggregate input REGARDLESS of join
  * strategy, so pre-shrinking pays even under a broadcast join (the
  * q196 shape: Expand×3 over fact-grain rows vs over |distinct
  * fk|-grain rows). With a single distinct group Spark plans the
  * no-Expand two-phase form and the plain broadcast economics apply.
  *
  * Opt-in via `spark.graft.eagerAgg.enabled` (default false; the
  * Verify/Bench mains enable it on the suite session after verifying
  * the star-schema dim keys). */
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
          join @ Join(_, _, jt, Some(_), _), _)
          if agg.getTagValue(Done).isEmpty && supportedJoin(jt) =>
        rewrite(agg, groupings, results, join).getOrElse(agg)
      case agg @ Aggregate(groupings, results,
          Project(pl, join @ Join(_, _, jt, Some(_), _)), _)
          if agg.getTagValue(Done).isEmpty && supportedJoin(jt) &&
            pl.forall(_.isInstanceOf[AttributeReference]) =>
        rewrite(agg, groupings, results, join).getOrElse(agg)
    }
  }

  /** INNER plus the fact-preserving outer joins. LEFT OUTER (the
    * reference's own J5 fact-enrichment shape writ large) is exact
    * under the SAME fold: with the dim key unique, every partial
    * group produces exactly ONE join output row — matched, or
    * null-extended (null-fk groups included: their collapsed partial
    * counts re-aggregate to the original row count). FULL OUTER is
    * NOT: a group of purely unmatched dim rows has no fact partial,
    * so a COUNT(*) would fold to 0 instead of the dim-row count. */
  private def supportedJoin(jt: org.apache.spark.sql.catalyst.plans.JoinType)
      : Boolean = jt match {
    case Inner => true
    case org.apache.spark.sql.catalyst.plans.LeftOuter => true
    case org.apache.spark.sql.catalyst.plans.RightOuter => true
    case _ => false
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
    // which side is the PROVEN-unique dim? Outer joins additionally
    // pin the orientation: only the PRESERVED side can be the fact
    // (pre-aggregating the null-extending side would collapse dim
    // rows the outer join must surface individually)
    val (fact, factKey, dim, factIsLeft) = join.joinType match {
      case Inner =>
        if (uniqueOn(join.right, rk)) (join.left, lk, join.right, true)
        else if (uniqueOn(join.left, lk)) (join.right, rk, join.left, false)
        else return None
      case org.apache.spark.sql.catalyst.plans.LeftOuter =>
        if (uniqueOn(join.right, rk)) (join.left, lk, join.right, true)
        else return None
      case org.apache.spark.sql.catalyst.plans.RightOuter =>
        if (uniqueOn(join.left, lk)) (join.right, rk, join.left, false)
        else return None
      case _ => return None
    }
    if (fact.isInstanceOf[Aggregate]) return None // already pre-shrunk
    // plain-attribute groupings only
    val groupAttrs: Seq[AttributeReference] = groupings.map {
      case a: AttributeReference => a
      case _ => return None
    }
    val factSet = fact.outputSet
    val dimSet = dim.outputSet
    val aggExprs: Seq[AggregateExpression] =
      results.flatMap(_.collect { case ae: AggregateExpression => ae })
        .distinct
    if (aggExprs.isEmpty) return None
    // classify every aggregate (see scaladoc); bail on the first
    // unsupported shape
    val factDistinct =
      scala.collection.mutable.LinkedHashSet.empty[AttributeReference]
    val partialized =
      scala.collection.mutable.ArrayBuffer.empty[AggregateExpression]
    aggExprs.foreach { ae =>
      if (ae.filter.isDefined) return None
      val fn = ae.aggregateFunction
      val supported = fn match {
        // LEGACY sums only: TRY/ANSI overflow semantics are not
        // two-level-decomposable (a partial group's overflow-NULL
        // would be silently skipped by the outer SUM where the
        // single-level try_sum NULLs the whole group), and a
        // distinct TRY sum's dedup set is still value-exact, so the
        // same conservatism applies uniformly
        case s: Sum => s.evalContext.evalMode == EvalMode.LEGACY
        // AVG decomposes as partial SUM+COUNT below, ONE division
        // above — the same sum-then-divide Spark's Average performs,
        // over the same DoubleType accumulator (non-decimal Average
        // sums in double), so the fold changes only addition order —
        // the reordering partial aggregation already performs.
        // Decimal averages are excluded: their precision/scale
        // derivation through a two-level fold is not value-identical
        case a: Average => a.evalMode == EvalMode.LEGACY &&
          a.child.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
          !a.child.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]
        case _: Min | _: Max | _: Count => true
        case _ => false
      }
      if (!supported) return None
      if (ae.isDistinct) {
        fn.children.foreach {
          case a: AttributeReference if factSet.contains(a) =>
            factDistinct += a
          case e if e.references.nonEmpty &&
              e.references.subsetOf(dimSet) => ()
          case e if e.foldable => ()
          case _ => return None
        }
      } else fn match {
        case f if f.children.forall(_.references.subsetOf(factSet)) =>
          partialized += ae
        case (_: Min | _: Max) if fn.references.subsetOf(dimSet) =>
          () // duplicate-insensitive over fk-determined values: free
        case _ => return None
      }
    }
    // COST GUARD (see scaladoc): stand down for broadcast-able dims —
    // except when n≥2 distinct groups make the Expand fan-out the
    // dominant cost on either join strategy
    val distinctGroups = aggExprs.filter(_.isDistinct)
      .map(_.aggregateFunction.children.map(_.canonicalized).toSet)
      .distinct.size
    val threshold = session.sessionState.conf.autoBroadcastJoinThreshold
    if (distinctGroups < 2 && threshold >= 0 &&
        dimBytesEstimate(dim).forall(_ <= threshold))
      return None
    // the partial: fact grouped by (join key ∪ fact-side group attrs
    // ∪ fact-side distinct inputs)
    val ga = groupAttrs.filter(a => factSet.contains(a))
    val partialGroup: Seq[AttributeReference] =
      (factKey +: (ga ++ factDistinct.toSeq)).distinct
    val pairs: Seq[(AggregateExpression, Seq[Alias])] =
      partialized.toSeq.map { ae =>
        val pfs: Seq[AggregateFunction] = ae.aggregateFunction match {
          // eval context carried over verbatim (admission pinned it
          // LEGACY) — Sum(child) alone would re-derive the mode from
          // the SESSION conf, changing overflow semantics under ANSI
          case s: Sum => Seq(Sum(s.child, s.evalContext))
          case m: Min => Seq(Min(m.child))
          case m: Max => Seq(Max(m.child))
          case c: Count => Seq(Count(c.children))
          // AVG: (sum in Average's own DoubleType accumulator, count
          // of non-null inputs) — re-folded as one division above
          case a: Average => Seq(
            Sum(Cast(a.child, org.apache.spark.sql.types.DoubleType),
              NumericEvalContext(EvalMode.LEGACY,
                allowDecimalPrecisionLoss = true)),
            Count(Seq(a.child)))
        }
        ae -> pfs.zipWithIndex.map { case (pf, i) =>
          Alias(pf.toAggregateExpression(),
            s"_eager_${ae.resultId.id}_$i")() }
      }
    val partialAgg = Aggregate(partialGroup,
      partialGroup ++ pairs.flatMap(_._2), fact)
    val newJoin =
      if (factIsLeft) join.copy(left = partialAgg)
      else join.copy(right = partialAgg)
    // outer re-aggregation, result types preserved; FREE aggregates
    // (distinct / dim-side min-max) have no repl entry and pass
    // through untouched — their inputs survive the pre-grouping by
    // construction
    def retyped(e: Expression, want: DataType): Expression =
      if (e.dataType == want) e else Cast(e, want)
    val legacyCtx =
      NumericEvalContext(EvalMode.LEGACY, allowDecimalPrecisionLoss = true)
    val repl: Map[AggregateExpression, Expression] = pairs.map {
      case (ae, als) =>
        val attr = als.head.toAttribute
        val outer: Expression = ae.aggregateFunction match {
          case s: Sum =>
            retyped(Sum(attr, s.evalContext).toAggregateExpression(),
              ae.dataType)
          case _: Min => retyped(Min(attr).toAggregateExpression(), ae.dataType)
          case _: Max => retyped(Max(attr).toAggregateExpression(), ae.dataType)
          case _: Count => Coalesce(Seq(
            retyped(Sum(attr, legacyCtx).toAggregateExpression(), LongType),
            Literal(0L)))
          // sum-of-sums / sum-of-counts, ONE division — exactly
          // Average's own final sum/count evaluation; LEGACY double
          // division returns NULL on count 0, matching Average's
          // empty-group null
          case _: Average =>
            val cnt = als(1).toAttribute
            retyped(Divide(
              Sum(attr, legacyCtx).toAggregateExpression(),
              Cast(Sum(cnt, legacyCtx).toAggregateExpression(),
                org.apache.spark.sql.types.DoubleType),
              legacyCtx), ae.dataType)
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

  /** Dim size estimate. Graft catalog tables: rows x a plain
    * per-column width from their own fresh ANALYZE stats (string
    * avgLen + offset, 8 for numerics); no fresh stats — treated as
    * broadcast-able (stand down: without evidence the join shuffles,
    * don't pay). Everything else (v1 file relations, temp views):
    * the plan's own sizeInBytes — the SAME figure Spark's join
    * selection uses for the broadcast decision, so the guard and the
    * planner agree by construction. */
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
    @annotation.tailrec
    def isGraft(q: LogicalPlan): Boolean = q match {
      case Filter(_, c) => isGraft(c)
      case Project(_, c) => isGraft(c)
      case r: DataSourceV2Relation => r.table.isInstanceOf[JsonlTable]
      case r: DataSourceV2ScanRelation => r.scan.isInstanceOf[JsonlScan]
      case _ => false
    }
    if (isGraft(p)) {
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
    } else Some(p.stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong)
  }

  /** Delegates to the shared evidence ([[UniquenessEvidence.uniqueOn]]):
    * graft-catalog ANALYZE channel + external-parquet CatalogStats
    * channel, both fingerprint-fresh. */
  private def uniqueOn(p: LogicalPlan, attr: AttributeReference): Boolean =
    UniquenessEvidence.uniqueOn(session, p, attr)
}

object EagerAggregation {
  /** Re-entry guard: the rewrite's own output is Aggregate-over-Join
    * again; the tag stops the fixed-point optimizer from stacking
    * partials forever (and the structural fact-is-Aggregate check
    * backs it up across plan copies that might drop tags). The
    * rewrite's own PARTIAL aggregate is deliberately NOT tagged — a
    * deeper join under it may cascade (the q196 3-way shape pre-
    * shrinks twice: lineitem by order key, then orders by customer
    * key). */
  private[plans] val Done = TreeNodeTag[Boolean]("graft.eagerAgg.done")
}
