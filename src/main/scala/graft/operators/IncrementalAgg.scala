package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a rollup table from mergeable partial
  * aggregates: `merge(prev, delta)` folds the aggregate of ONLY the
  * new data into the stored aggregate instead of rescanning history —
  * the standard refresh pattern for a gold-layer cube fed by daily
  * partitions (the reference recomputes its gold cube per partition
  * for the same reason: etl.py:616-677 builds only the day being
  * published).
  *
  * Correctness rests on the measures being decomposable: SUM, COUNT
  * (re-summed), MIN, MAX satisfy `f(A ∪ B) = f(f(A) ⊎ f(B))`, so
  * merging partial states equals the full recompute (q86 proves this
  * against a full-recompute DuckDB oracle). AVG and COUNT DISTINCT are
  * NOT decomposable in value form — carry (sum, count) or a KMV/exact
  * key set instead; the `require` rejects anything but the closed set.
  *
  * Shape at 100 TB: the only corpus-scale work is aggregating the new
  * partition (one partial-aggregable shuffle of ONE day of data); the
  * merge itself unions two aggregate-grain frames (rows = |group
  * keys|, metadata-scale next to the facts) and re-aggregates —
  * history is never read. Decimal SUM columns stay decimal through
  * both levels, so incremental and full recompute are bit-identical.
  */
object IncrementalAgg {

  /** `prev` and `delta` must share the schema keys ++ measures, with
    * `delta` aggregated to the same grain (via [[aggregate]]).
    * `measures` maps column -> "sum" | "min" | "max". */
  def merge(prev: DataFrame, delta: DataFrame, keys: Seq[String],
            measures: Map[String, String]): DataFrame = {
    val aggs = aggExprs(measures)
    prev.select(columns(keys, measures): _*)
      .unionByName(delta.select(columns(keys, measures): _*))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The per-partition (or first-build) aggregate at the rollup
    * grain: COUNT rides as a SUM-mergeable long. */
  def aggregate(rows: DataFrame, keys: Seq[String],
                measures: Map[String, String]): DataFrame = {
    val aggs = aggExprs(measures)
    rows.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge-MAINTAINED materialized aggregate: fold `delta` (raw rows)
    * into the rollup table stored at `path`. Only the groups the
    * delta touches participate in the re-aggregation — their stored
    * partials merge with the delta's and the result UPSERTS over them
    * via [[MergeUpsert]]; untouched groups' rows pass through the
    * upsert untouched. First call creates the table from the delta's
    * aggregate. The stored table is aggregate-grain (|group keys|
    * rows, metadata scale next to the facts), so [[MergeUpsert
    * .intoPath]]'s whole-table staged rewrite is the right publish —
    * crash-safe swap included; at partition-count grain use
    * [[MergeUpsert.intoPartitionedPath]] with the same upsert frame.
    * Incremental == full recompute is gated by q121's oracle after
    * three waves. */
  def mergeInto(spark: org.apache.spark.sql.SparkSession, path: String,
                delta: DataFrame, keys: Seq[String],
                measures: Map[String, String]): Unit = {
    val d = aggregate(delta, keys, measures)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // both branches publish through intoPath's staged swap: a crash
    // mid-first-build must leave no partial parquet dir that the next
    // wave would read as `prev` and silently merge into wrong partials
    val upsert =
      if (!fs.exists(p)) d
      else {
        val prev = spark.read.parquet(path)
        val touched = prev.join(d.select(keys.map(col): _*), keys, "left_semi")
        merge(touched, d, keys, measures)
      }
    MergeUpsert.intoPath(spark, path, upsert, keys)
  }

  private def columns(keys: Seq[String], measures: Map[String, String]) =
    (keys ++ measures.keys.toSeq.sorted).map(col)

  private def aggExprs(measures: Map[String, String]) = {
    require(measures.nonEmpty, "at least one measure")
    measures.toSeq.sortBy(_._1).map { case (c, how) =>
      (how match {
        case "sum" => sum(col(c))
        case "min" => min(col(c))
        case "max" => max(col(c))
        case other => throw new IllegalArgumentException(
          s"measure $c: '$other' is not decomposable (sum|min|max; " +
            "carry avg as sum+count, distinct as a KMV sketch or key set)")
      }).as(c)
    }
  }
}
