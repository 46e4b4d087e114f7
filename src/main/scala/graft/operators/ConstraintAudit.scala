package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing (the Deequ/dbt-tests shape): a
  * rule set evaluated over a table in ONE scan, plus referential-
  * integrity checks as anti-join counts — the validation layer a
  * warehouse runs between landing and publish.
  *
  * Semantics: a row VIOLATES a rule when the predicate is NOT TRUE —
  * so a NULL predicate result (e.g. `null > 0`) counts as a
  * violation, the conservative reading a completeness check needs.
  *
  * Shape at 100 TB: all row rules share one partial-aggregable
  * aggregate (no per-rule scans); the wide one-row result is
  * unpivoted to per-rule rows with `stack` (rows = |rules|,
  * metadata-scale). FK audits are one anti-join each, broadcast when
  * the parent is a dim. Nothing collects. */
object ConstraintAudit {

  /** `name` must be a bare identifier (`[A-Za-z0-9_]+`): it becomes a
    * column alias and a SQL literal inside the generated `stack`
    * expression, and anything else would break parsing there. Checked
    * at construction so the error names the rule, not the parser. */
  final case class Rule(name: String, predicate: Column) {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"rule name must match [A-Za-z0-9_]+: '$name'")
  }

  /** Per-rule `(rule, n_rows, n_violations, pass)` — one scan for the
    * whole rule set. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map(r => sum(when(not(coalesce(r.predicate, lit(false))), 1L)
        .otherwise(0L)).as(s"v_${r.name}"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot |rules| violation columns to rows: stack(n, name1, v1, ...)
    val stackArgs = rules.map(r => s"'${r.name}', v_${r.name}").mkString(", ")
    wide.selectExpr("n_rows", s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)")
      .select(col("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Referential integrity: `(rule, n_rows, n_violations, pass)` where
    * a violation is a child row whose `childKey` has no match in
    * `parent.parentKey` (NULL child keys are orphans too — same
    * NOT-TRUE convention). Counted via the join, not collected. */
  def fkAudit(name: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String,
              broadcastParent: Boolean = true): DataFrame = {
    val keys = parent.select(col(parentKey)).distinct()
    val p = if (broadcastParent) broadcast(keys) else keys
    val orphans = child.join(p, col(childKey) === col(parentKey), "left_anti")
    val n = child.agg(count(lit(1)).as("n_rows"))
    val v = orphans.agg(count(lit(1)).as("n_violations"))
    n.crossJoin(v).select(lit(name).as("rule"), col("n_rows"),
      col("n_violations"), (col("n_violations") === 0L).as("pass"))
  }
}
