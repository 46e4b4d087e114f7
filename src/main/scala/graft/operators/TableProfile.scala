package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiler — the `ANALYZE TABLE`-grade statistics pass every
  * warehouse keeps per column (the reference eyeballs frames with
  * pandas `info()`-style checks; here it is one declarative pass):
  * per column, null count, exact distinct count, and numeric min/max,
  * plus the row count.
  *
  * ONE scan, one aggregation: Catalyst plans the multi-column
  * `COUNT(DISTINCT ...)` set as a single Expand — input rows are
  * replicated ×(columns+1) and partially aggregated map-side, so the
  * table is still read once. That Expand is the honest cost of EXACT
  * per-column distincts at 100 TB; when estimates suffice, swap
  * `countDistinct` for `approx_count_distinct` (HLL, no Expand) or
  * the KMV sketch ([[graft.functions.KmvSketch]]) and the plan
  * collapses to a plain single aggregate. Exact is the default
  * because it is oracle-checkable.
  *
  * Output: one row per column, ordered by name —
  * (col_name, n_rows, n_nulls, n_distinct, min_num, max_num);
  * min/max are surfaced as DOUBLE for numeric columns and NULL
  * otherwise (string/timestamp extrema are type-dependent renderings
  * two engines rarely agree on; distinct/null counts are the
  * engine-neutral facts).
  */
object TableProfile {

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    def isNum(t: DataType): Boolean = t match {
      case _: NumericType => true
      case _ => false
    }
    def q(n: String) = s"`$n`"
    val aggs =
      count(lit(1)).as("__n") +: fields.flatMap { f =>
        val c = col(q(f.name))
        Seq(count(c).as(s"__cnt_${f.name}"),
          countDistinct(c).as(s"__nd_${f.name}")) ++
          (if (isNum(f.dataType))
            Seq(min(c).cast("double").as(s"__min_${f.name}"),
              max(c).cast("double").as(s"__max_${f.name}"))
          else Nil)
      }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = fields.map { f =>
      val minMax =
        if (isNum(f.dataType)) s"${q("__min_" + f.name)}, ${q("__max_" + f.name)}"
        else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
      s"'${f.name}', __n - ${q("__cnt_" + f.name)}, ${q("__nd_" + f.name)}, $minMax"
    }.mkString(", ")
    agged.select(col("__n"), expr(
        s"stack(${fields.length}, $stackArgs) " +
          "AS (col_name, n_nulls, n_distinct, min_num, max_num)"))
      .select(col("col_name"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"))
      .orderBy("col_name")
  }
}
