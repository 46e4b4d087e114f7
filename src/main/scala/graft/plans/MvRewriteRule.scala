package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, DecimalType, LongType}

/** Transparent materialized-aggregate rewrite — the serving half of
  * [[graft.operators.IncrementalAgg]]: a query that aggregates the
  * FACT table is answered from the (merge-maintained, metadata-scale)
  * rollup table instead, without the query author knowing the rollup
  * exists. At 100 TB this turns a full fact scan + shuffle into a scan
  * of |group keys| rows — the standard BI-serving contract (BigQuery
  * materialized views do exactly this for the reference's gold cubes;
  * reference: dags/utils/etl.py:616-677 publishes such a cube).
  *
  * Soundness model (the same decomposability contract IncrementalAgg
  * enforces at build time):
  *   - the MV stores, per key tuple, partials that re-aggregate
  *     losslessly over any key subset: SUM→SUM, COUNT→SUM of counts,
  *     MIN→MIN, MAX→MAX;
  *   - a query matches only if its scan is the registered fact path,
  *     its grouping columns are a SUBSET of the MV keys, its filters
  *     reference MV keys only (re-applied verbatim on the MV), and
  *     every aggregate is one of the registered measure expressions —
  *     matched STRUCTURALLY (`sum(CAST(c AS DECIMAL(p,s)))` only
  *     rewrites if the MV was declared over that exact cast, so a
  *     query computing anything else over a same-named column never
  *     silently reads the wrong partial;
  *   - DISTINCT aggregates, aggregate FILTER clauses, and non-column
  *     grouping expressions never match (not decomposable from
  *     partials).
  * Rewritten sums re-sum partials, so the result dtype widens one
  * decimal step — the rule casts back to the original query's dtype,
  * keeping the rewritten plan a drop-in (values are identical; the
  * cast cannot overflow because the full-scan sum already fit).
  * COUNT(*) becomes `coalesce(sum(n_rows), 0)` so a global aggregate
  * over an empty fact still returns 0, not null.
  *
  * Registration is conf-driven (`spark.graft.mv.specs`), one spec per
  * MV separated by `;;`:
  * {{{ mvPath|factPath|key1,key2|sum:qty@12.2=sum_qty,count:*=n_rows,max:ship=max_ship }}}
  * where `col@p.s` declares the decimal-cast sum idiom and `*` the
  * row count. The MV relation is instantiated fresh per match (exprIds
  * must be unique per occurrence); its schema is validated against the
  * spec on first use and a bad spec fails the query loudly rather
  * than silently serving wrong partials.
  */
case class MvRewriteRule(session: SparkSession) extends Rule[LogicalPlan] {

  import MvRewriteRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val specs = parseSpecs(session.conf.get("spark.graft.mv.specs", ""))
    if (specs.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(groupings, results, child, _) =>
        specs.view.flatMap(rewrite(agg, groupings, results, child, _))
          .headOption.getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, groupings: Seq[Expression],
                      results: Seq[NamedExpression], child: LogicalPlan,
                      spec: MvSpec): Option[LogicalPlan] = {
    // 1. the scan under (attribute-only Projects / Filters) must be the fact
    val (conds, relation) = unwrap(child, Nil) match {
      case Some(x) => x
      case None => return None
    }
    if (!scansPath(relation, spec.factPath)) return None
    // 2. grouping columns ⊆ MV keys; filters reference MV keys only
    val groupCols = groupings.map {
      case a: AttributeReference if spec.keys.contains(a.name) => a
      case _ => return None
    }
    if (conds.exists(_.references.exists(r => !spec.keys.contains(r.name))))
      return None
    // 3. every output is a grouping key or a registered measure
    val plans = results.map(r => planResult(r, spec).getOrElse(return None))
    // 4. build the MV scan (fresh exprIds per occurrence) and re-key
    val mv = session.read.parquet(spec.mvPath).queryExecution.analyzed
    val byName: Map[String, AttributeReference] =
      mv.output.collect { case a: AttributeReference => a.name -> a }.toMap
    def mvAttr(n: String): AttributeReference = byName.getOrElse(n,
      throw new IllegalArgumentException(
        s"spark.graft.mv.specs: MV ${spec.mvPath} has no column '$n' " +
          s"(schema: ${mv.output.map(_.name).mkString(", ")})"))
    spec.keys.foreach(mvAttr); spec.measures.foreach(m => mvAttr(m.mvCol))
    val filtered = conds.foldLeft(mv)((p, c) => Filter(c.transform {
      case a: AttributeReference => mvAttr(a.name)
    }, p))
    val newResults = plans.map(_(mvAttr))
    Some(Aggregate(groupCols.map(g => mvAttr(g.name)), newResults, filtered))
  }

  /** Does this aggregate function match a registered measure, and as
    * which kind? The structural patterns are the exact build-side
    * idioms ([[graft.operators.IncrementalAgg]] + the `Exact` decimal
    * cast) — nothing else rewrites. */
  private def matchAgg(f: AggregateFunction, spec: MvSpec)
      : Option[(Measure, String)] = f match {
    case Count(Seq(Literal(_, _))) => spec.measure("count", "*").map((_, "count"))
    case Sum(a: AttributeReference, _) =>
      spec.measure("sum", a.name).map((_, "sum"))
    case Sum(Cast(a: AttributeReference, d: DecimalType, _, _), _) =>
      spec.measure("sum", s"${a.name}@${d.precision}.${d.scale}").map((_, "sum"))
    case Min(a: AttributeReference) => spec.measure("min", a.name).map((_, "min"))
    case Max(a: AttributeReference) => spec.measure("max", a.name).map((_, "max"))
    case _ => None
  }

  private def buildAgg(kind: String, partial: AttributeReference,
                       want: DataType): Expression = kind match {
    case "count" => Coalesce(Seq(
      Cast(Sum(partial).toAggregateExpression(), LongType), Literal(0L)))
    case "sum" => recast(Sum(partial).toAggregateExpression(), want)
    case "min" => recast(Min(partial).toAggregateExpression(), want)
    case "max" => recast(Max(partial).toAggregateExpression(), want)
  }

  /** One result expression → a builder from MV attributes, or None if
    * it is not answerable from the registered partials. Handles
    * aggregates ANYWHERE in the expression tree (CollapseProject folds
    * post-aggregation casts/arithmetic into the Aggregate's result
    * expressions), as long as every AggregateExpression inside matches
    * a measure and every attribute outside one is a grouping key. */
  private def planResult(r: NamedExpression, spec: MvSpec)
      : Option[(String => AttributeReference) => NamedExpression] = {
    def ok(e: Expression): Boolean = e match {
      case AggregateExpression(f, _, false, None, _) =>
        matchAgg(f, spec).isDefined
      case _: AggregateExpression => false // distinct / FILTER: no partials
      case a: AttributeReference => spec.keys.contains(a.name)
      case other => other.deterministic && other.children.forall(ok)
    }
    // explicit recursion, not transformDown: the rebuilt aggregate must
    // not itself be re-visited (its Sum-over-partial would fail the
    // measure lookup)
    def rebuild(e: Expression, mv: String => AttributeReference): Expression =
      e match {
        case ae @ AggregateExpression(f, _, false, None, _) =>
          val (m, kind) = matchAgg(f, spec).get
          buildAgg(kind, mv(m.mvCol), ae.dataType)
        case a: AttributeReference => mv(a.name)
        case other => other.mapChildren(rebuild(_, mv))
      }
    r match {
      case a: AttributeReference if spec.keys.contains(a.name) =>
        Some(mv => Alias(mv(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(e, name) if ok(e) =>
        Some(mv => Alias(rebuild(e, mv), name)(exprId = al.exprId))
      case _ => None
    }
  }

  private def recast(e: Expression, want: DataType): Expression =
    if (e.dataType == want) e else Cast(e, want)

  /** Peel attribute-only Projects and Filters down to the scan. */
  @annotation.tailrec
  private def unwrap(plan: LogicalPlan, conds: Seq[Expression])
      : Option[(Seq[Expression], LogicalRelation)] = plan match {
    case lr: LogicalRelation => Some((conds, lr))
    case Filter(c, child) if c.deterministic => unwrap(child, conds :+ c)
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(child, conds)
    case _ => None
  }

  private def scansPath(lr: LogicalRelation, path: String): Boolean =
    lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(p => normalize(p.toString) == path)
      case _ => false
    }
}

object MvRewriteRule {

  /** `kind` ∈ sum|count|min|max; `colSpec` is the fact column, with
    * `@p.s` marking the decimal-cast sum idiom, or `*` for COUNT(*). */
  final case class Measure(kind: String, colSpec: String, mvCol: String)

  final case class MvSpec(mvPath: String, factPath: String,
                          keys: Seq[String], measures: Seq[Measure]) {
    def measure(kind: String, colSpec: String): Option[Measure] =
      measures.find(m => m.kind == kind && m.colSpec == colSpec)
  }

  def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  private[plans] def parseSpecs(conf: String): Seq[MvSpec] =
    conf.split(";;").map(_.trim).filter(_.nonEmpty).toSeq.map { s =>
      s.split("\\|") match {
        case Array(mvPath, factPath, keys, measures) =>
          MvSpec(normalize(mvPath), normalize(factPath),
            keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
            measures.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { m =>
              m.split("[:=]") match {
                case Array(kind, colSpec, mvCol) => Measure(kind, colSpec, mvCol)
                case _ => throw new IllegalArgumentException(
                  s"spark.graft.mv.specs measure '$m' is not kind:col=mvCol")
              }
            })
        case _ => throw new IllegalArgumentException(
          s"spark.graft.mv.specs entry '$s' is not mvPath|factPath|keys|measures")
      }
    }
}
