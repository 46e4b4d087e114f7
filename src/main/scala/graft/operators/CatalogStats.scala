package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  // ------------------------------------------------- exact uniqueness
  //
  // EXTERNAL-PARQUET twin of the graft catalog's `analyze_table(...,
  // unique_candidates => ...)` machinery: an EXACT duplicate-free
  // verification of a column over a path-based parquet relation,
  // served to [[graft.plans.EagerAggregation]] only while the file
  // set's content fingerprint (name + length + mtime of every data
  // file) still matches. Any rewrite/append/replace of the files
  // changes the fingerprint and silently withdraws the premise — the
  // same stale-stats conservatism the catalog tier applies. The probe
  // is one grouped pass per column (offline / suite-setup cadence);
  // the freshness check at plan time is one directory listing.

  private case class UniqueEntry(fingerprint: String, cols: Set[String])
  private val uniqueVerified =
    new java.util.concurrent.ConcurrentHashMap[String, UniqueEntry]()

  /** Canonical registry key for a relation's root paths: each path
    * FS-qualified (a bare `/tmp/x` and Spark's reported `file:/tmp/x`
    * must collide), then sorted (the order Spark reports multi-path
    * relations in is not stable). */
  def pathKey(spark: SparkSession, rootPaths: Seq[String]): String = {
    val conf = spark.sessionState.newHadoopConf()
    rootPaths.map { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      p.getFileSystem(conf).makeQualified(p).toString
    }.sorted.mkString(",")
  }

  /** Content fingerprint of the DATA files under `rootPaths`:
    * relative name + length + mtime, order-insensitively hashed.
    * Hidden/underscore entries (_SUCCESS, .crc) are layout noise. */
  def filesFingerprint(spark: SparkSession, rootPaths: Seq[String]): String = {
    val conf = spark.sessionState.newHadoopConf()
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    rootPaths.foreach { root =>
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(conf)
      def walk(d: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(d).foreach { st =>
          val n = st.getPath.getName
          if (!n.startsWith("_") && !n.startsWith(".")) {
            if (st.isDirectory) walk(st.getPath)
            else parts += s"$n:${st.getLen}:${st.getModificationTime}"
          }
        }
      if (fs.isFile(p))
        parts += s"${p.getName}:${fs.getFileStatus(p).getLen}:" +
          s"${fs.getFileStatus(p).getModificationTime}"
      else walk(p)
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.sorted.foreach(s => md.update(s.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** EXACTLY verify `cols` duplicate-free over non-null values in the
    * parquet relation at `path`, and remember the verdict under the
    * current content fingerprint. Returns the verified subset.
    * Re-verification after the files change is the caller's call —
    * the registry itself only ever answers for the fingerprint it
    * proved. */
  def verifyUnique(spark: SparkSession, path: String,
                   cols: Seq[String]): Set[String] = {
    val fp = filesFingerprint(spark, Seq(path))
    val key = pathKey(spark, Seq(path))
    val prior = Option(uniqueVerified.get(key))
      .filter(_.fingerprint == fp).map(_.cols).getOrElse(Set.empty)
    val todo = cols.filterNot(prior.contains)
    val fresh = todo.filter { c =>
      spark.read.parquet(path).where(col(c).isNotNull)
        .groupBy(col(c)).count().where(col("count") > 1L)
        .limit(1).isEmpty
    }.toSet
    uniqueVerified.put(key, UniqueEntry(fp, prior ++ fresh))
    prior ++ fresh
  }

  // plan-time freshness memo (`spark.graft.eagerAgg.fingerprint.ttl.ms`,
  // default 0 = re-list on every probe): locally a listStatus is
  // microseconds, but the fixed-point optimizer probes several times
  // per query, and at object-store scale each probe is a real LIST
  // call — a small TTL bounds both, at the cost of delaying staleness
  // DETECTION (never soundness of what was proved) by at most the TTL
  private val fpMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  /** Verified-unique columns of the relation at `rootPaths`, IF its
    * content fingerprint still matches the one proved. Empty set (no
    * I/O beyond one listing — TTL-memoized when configured — and none
    * at all for never-verified relations) otherwise. */
  def freshUniqueColumns(spark: SparkSession,
                         rootPaths: Seq[String]): Set[String] = {
    val key = pathKey(spark, rootPaths)
    val e = uniqueVerified.get(key)
    if (e == null) return Set.empty
    val ttlMs =
      try spark.conf.get("spark.graft.eagerAgg.fingerprint.ttl.ms", "0").toLong
      catch { case _: NumberFormatException => 0L }
    val now = System.nanoTime()
    val cached = fpMemo.get(key)
    val fp =
      if (ttlMs > 0 && cached != null && (now - cached._2) / 1000000L < ttlMs)
        cached._1
      else {
        val f = filesFingerprint(spark, rootPaths)
        fpMemo.put(key, (f, now))
        f
      }
    if (fp == e.fingerprint) e.cols else Set.empty
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
