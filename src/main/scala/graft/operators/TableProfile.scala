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
    // user column names never enter a parsed context: the frame is
    // positionally renamed to namespaced index names first (a legal
    // name may contain quotes/backticks/dots), and internal aliases
    // are index-based so no user column can collide with an alias
    // another column produces; original names survive only as output
    // LITERALS
    val P = "__graft_profile_"
    val safe = df.toDF(fields.indices.map(i => s"${P}c$i"): _*)
    val aggs =
      count(lit(1)).as(s"${P}n") +: fields.zipWithIndex.flatMap { case (f, i) =>
        val c = col(s"${P}c$i")
        Seq(count(c).as(s"${P}cnt_$i"),
          countDistinct(c).as(s"${P}nd_$i")) ++
          (if (isNum(f.dataType))
            Seq(min(c).cast("double").as(s"${P}min_$i"),
              max(c).cast("double").as(s"${P}max_$i"))
          else Nil)
      }
    val agged = safe.agg(aggs.head, aggs.tail: _*)
    val nullD = lit(null).cast("double")
    val rows = fields.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f.name).as("col_name"),
        (col(s"${P}n") - col(s"${P}cnt_$i")).as("n_nulls"),
        col(s"${P}nd_$i").as("n_distinct"),
        (if (isNum(f.dataType)) col(s"${P}min_$i") else nullD).as("min_num"),
        (if (isNum(f.dataType)) col(s"${P}max_$i") else nullD).as("max_num"))
    }
    agged.select(col(s"${P}n").as("n_rows"), inline(array(rows: _*)))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"))
      .orderBy("col_name")
  }

  /** The 100 TB profile: same per-column shape as [[profile]] but the
    * distinct counts come from KMV sketches
    * ([[graft.functions.KmvSketch]], fixed k-longs state per column)
    * instead of the exact `COUNT(DISTINCT)` set — so the plan is ONE
    * plain hash aggregate with NO Expand (no ×(columns+1) row
    * replication), which is what makes profiling affordable on a
    * wide fact table. Still deterministic: the `(k-1)·H/h_k`
    * estimator over a 48-bit md5-prefix hash is a pure function of
    * the column's value set, bit-reproducible in any engine (unlike
    * HLL) — which keeps even the APPROXIMATE profile under the
    * oracle gate.
    *
    * Hashing renders values to strings deterministically per type:
    * integers/strings/timestamps via CAST AS STRING (date-grain
    * timestamps render identically across engines), doubles through
    * a DECIMAL(18,2) cast (fixed-scale rendering — raw double→string
    * is engine-dependent). */
  def profileApprox(df: DataFrame, k: Int = 64): DataFrame = {
    val fields = df.schema.fields.toSeq
    val P = "__graft_profile_"
    val safe = df.toDF(fields.indices.map(i => s"${P}c$i"): _*)
    def render(f: StructField, c: org.apache.spark.sql.Column) = f.dataType match {
      case DoubleType | FloatType => c.cast("decimal(18,2)").cast("string")
      case _ => c.cast("string")
    }
    val aggs =
      count(lit(1)).as(s"${P}n") +: fields.zipWithIndex.flatMap { case (f, i) =>
        val c = col(s"${P}c$i")
        val h = conv(substring(md5(render(f, c)), 1, 12), 16, 10).cast("long")
        Seq(count(c).as(s"${P}cnt_$i"),
          graft.functions.Native.kmvSketch(h, k).as(s"${P}kmv_$i"))
      }
    val agged = safe.agg(aggs.head, aggs.tail: _*)
    val rows = fields.zipWithIndex.map { case (f, i) =>
      val kmv = col(s"${P}kmv_$i")
      struct(
        lit(f.name).as("col_name"),
        (col(s"${P}n") - col(s"${P}cnt_$i")).as("n_nulls"),
        when(size(kmv) < k, size(kmv).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(graft.llm.CorpusOps.HashSpace) /
            element_at(kmv, k).cast("double")).as("est_distinct"))
    }
    agged.select(col(s"${P}n").as("n_rows"), inline(array(rows: _*)))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("est_distinct"))
      .orderBy("col_name")
  }
}
