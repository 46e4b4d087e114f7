package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cost-based-optimizer enablement: catalog registration + ANALYZE
  * stats + a CBO-tuned child session.
  *
  * Catalyst's CBO (join reordering, stats-based broadcast decisions,
  * smarter build-side choice) only engages when relations carry
  * catalog statistics — path-based `spark.read.parquet` scans never
  * do (they fall back to file-size estimates). This operator closes
  * that gap for a warehouse directory: each table is registered ONCE
  * as an external parquet table in a per-directory database (name
  * keyed by an md5 of the path, so sf0.01 and sf0.1 catalogs coexist
  * and never point a shared name at a stale location), then
  * `ANALYZE TABLE` computes row counts and per-column NDV/min/max
  * histogramless stats into the in-memory catalog.
  *
  * Session discipline (same rule as the range-join confs): CBO flags
  * are flipped on a CHILD session from [[cboSession]] — the shared
  * session's planner is never reconfigured behind other queries'
  * backs. The external catalog itself is shared state, which is
  * exactly what makes the stats visible to the child.
  *
  * Scale: ANALYZE is one pass per table (partial-aggregable count +
  * per-column aggregates) and is an offline maintenance action — the
  * same cadence class as [[Compaction]]/[[ZOrder]]. At 100 TB you
  * analyze once per ingest wave; every subsequent query plans with
  * real cardinalities instead of byte-size guesses.
  */
object CatalogStats {

  /** Stable per-directory database name. */
  def dbFor(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"graft_cbo_$h"
  }

  // per-JVM memo of ANALYZE work already done: table key -> column
  // stats computed so far (empty set = table stats only). Stats live
  // in the shared external catalog, so re-ANALYZE per call would
  // re-scan every table on every invocation (ANALYZE is an
  // ingest-wave cadence action, not a per-query one — the same
  // amortization as the q97 layout cache). Keyed per column set so a
  // no-columns caller can never suppress a later caller's column
  // stats — only genuinely-new columns trigger a scan.
  private val analyzed =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  /** Idempotently register `tables` under [[dbFor]] as external
    * parquet tables over `dir`, and ANALYZE each ONCE per JVM per
    * requested stat (table stats on first sight; column stats for
    * whatever of `statCols(table)` has not been computed yet;
    * `force = true` recomputes everything — the post-ingest refresh
    * path — and still updates the memo). Returns the database name. */
  def registerAndAnalyze(spark: SparkSession, dir: String,
                         tables: Seq[String],
                         statCols: Map[String, Seq[String]] = Map.empty,
                         force: Boolean = false): String = {
    val db = dbFor(dir)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    tables.foreach { tbl =>
      spark.sql(s"CREATE TABLE IF NOT EXISTS $db.$tbl USING parquet " +
        s"LOCATION '$dir/$tbl.parquet'")
      val key = s"$db.$tbl"
      val wanted = statCols.getOrElse(tbl, Nil).toSet
      val covered = Option(analyzed.get(key))
      val tableStatsNeeded = force || covered.isEmpty
      val colsNeeded =
        if (force) wanted else wanted -- covered.getOrElse(Set.empty)
      if (tableStatsNeeded)
        spark.sql(s"ANALYZE TABLE $db.$tbl COMPUTE STATISTICS")
      if (colsNeeded.nonEmpty)
        spark.sql(s"ANALYZE TABLE $db.$tbl COMPUTE STATISTICS " +
          s"FOR COLUMNS ${colsNeeded.toSeq.sorted.mkString(", ")}")
      analyzed.merge(key, wanted, (a, b) => a ++ b)
    }
    db
  }

  /** Catalog row count the optimizer will plan with (None when the
    * table was never analyzed — the fallback-estimate regime).
    * Evaluated through a CBO child session: plan-level `rowCount`
    * only surfaces when `spark.sql.cbo.enabled` is on, which is
    * exactly the regime this operator exists to feed.
    * Plan-stats computation reads `SQLConf.get` (the THREAD-ACTIVE
    * session), not the plan's own session — so the child is set
    * active for the duration and the caller's active session
    * restored after. */
  def plannedRowCount(spark: SparkSession, db: String, table: String): Option[BigInt] = {
    val child = cboSession(spark)
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(child)
    try child.table(s"$db.$table").queryExecution.optimizedPlan.stats.rowCount
    finally prev match {
      // restore OR clear: leaving the CBO child thread-active on a
      // previously-sessionless thread would be exactly the planner
      // contamination this class promises to avoid
      case Some(s) => SparkSession.setActiveSession(s)
      case None => SparkSession.clearActiveSession()
    }
  }

  /** Child session with the cost-based optimizer and stats-driven
    * join reordering on. The parent session's planner is untouched. */
  def cboSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.conf.set("spark.sql.statistics.histogram.enabled", "true")
    s
  }
}
