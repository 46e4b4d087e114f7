package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Incremental maintenance of a MATERIALIZED EQUI-JOIN view under
  * insert-only deltas — the join-side complement of
  * [[IncrementalAgg.mergeInto]]'s aggregate maintenance.
  *
  * Delta algebra (bag semantics, exact): with accumulated sides L and
  * R and new arrivals ΔL and ΔR,
  *
  *   Δout = ΔL ⋈ (R ∪ ΔR)  ∪  (L ⋈ ΔR)
  *
  * — the ΔL⋈ΔR cross term rides inside the first join, each existing
  * row joins each delta exactly once, so appending Δout to the view
  * equals recomputing (L∪ΔL) ⋈ (R∪ΔR) from scratch (q144's oracle
  * proves it after three waves; multiplicity is preserved because
  * every term is a bag join and the append is a bag union).
  *
  * Why this matters at 100 TB: each wave's work is `|Δ| ⋈ state` —
  * two joins whose ONE side is delta-sized — and an O(|Δout|) append.
  * The full join is never recomputed and history is never rewritten;
  * a daily delta against a year of facts costs a day's join, not a
  * year's.
  *
  * Layout and crash safety (single writer, like [[MergeUpsert]]):
  *
  *   root/waves/<waveId>/{left,right,out}/   committed batches
  *   root/_staging/<waveId>/...              wave being written
  *
  * A wave stages ALL THREE batch directories under `_staging/<id>`,
  * then ONE directory rename `_staging/<id>` → `waves/<id>` commits
  * the wave atomically (HDFS/local rename; on object stores front
  * with [[graft.warehouse.VersionedTable]], same caveat as
  * MergeUpsert). State is the union of COMMITTED wave batches only:
  * a crash mid-stage leaves an orphan under `_staging` that readers
  * never see and [[recover]] clears; a crash between staging and
  * rename loses nothing but the wave, which simply re-runs. A waveId
  * that is already committed is skipped (idempotent replay — the
  * at-least-once scheduler contract, same as the reference's rerun-
  * safe day partitions).
  */
object IncrementalJoin {

  /** Fold one wave of arrivals into the materialized state at `root`.
    * `keys` are the equi-join columns (must exist on both sides; the
    * view carries left columns then right's non-key columns, Spark's
    * `join(_, Seq(...))` shape). No-op if `waveId` is already
    * committed. */
  def mergeInto(spark: SparkSession, root: String, waveId: String,
                deltaLeft: DataFrame, deltaRight: DataFrame,
                keys: Seq[String]): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = new Path(root, s"waves/$waveId")
    if (fs.exists(committed)) return // idempotent replay
    recover(spark, root)

    val l = state(spark, root, "left")
    val r = state(spark, root, "right")
    val rNew = r.map(_.unionByName(deltaRight)).getOrElse(deltaRight)
    val newFromLeft = deltaLeft.join(rNew, keys)
    val deltaOut = l match {
      case Some(lAcc) => newFromLeft.unionByName(lAcc.join(deltaRight, keys))
      case None => newFromLeft
    }

    val staging = new Path(root, s"_staging/$waveId")
    deltaLeft.write.mode("overwrite").parquet(new Path(staging, "left").toString)
    deltaRight.write.mode("overwrite").parquet(new Path(staging, "right").toString)
    deltaOut.write.mode("overwrite").parquet(new Path(staging, "out").toString)
    fs.mkdirs(committed.getParent)
    require(fs.rename(staging, committed),
      s"wave commit rename $staging -> $committed failed")
    // the rename moved the only child out; drop the now-empty staging
    // parent (non-recursive: a concurrent writer's fresh staging — not
    // supported, but defended — would make the delete fail, not vanish)
    val stagingParent = staging.getParent
    if (fs.exists(stagingParent) && fs.listStatus(stagingParent).isEmpty)
      fs.delete(stagingParent, false)
  }

  /** The materialized join view: union of committed out batches. */
  def view(spark: SparkSession, root: String): Option[DataFrame] =
    state(spark, root, "out")

  /** Accumulated side state (union of committed batches); None before
    * the first committed wave. */
  def state(spark: SparkSession, root: String, which: String): Option[DataFrame] = {
    val waves = new Path(root, "waves")
    val fs = waves.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(waves)) return None
    val batches = fs.listStatus(waves)
      .filter(_.isDirectory)
      .map(st => new Path(st.getPath, which).toString)
      .sorted
    if (batches.isEmpty) None
    else Some(spark.read.parquet(batches.toIndexedSeq: _*))
  }

  /** Clear orphaned staging (a wave that crashed before its commit
    * rename). Committed waves are never touched. Called automatically
    * by [[mergeInto]]. */
  def recover(spark: SparkSession, root: String): Unit = {
    val staging = new Path(root, "_staging")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(staging)) fs.delete(staging, true)
  }
}
