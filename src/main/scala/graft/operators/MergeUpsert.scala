package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.hadoop.fs.Path

/** Keyed MERGE upsert (SURVEY.md S9).
  *
  * The reference stages to a temp table then runs a BigQuery
  * `MERGE ... WHEN MATCHED THEN UPDATE ... WHEN NOT MATCHED THEN INSERT`
  * (reference: dags/utils/common/data_helper.py:76-106). On a plain
  * parquet lake the same result is `target ANTI-JOIN source ON pks`
  * unioned with the full source — matched rows are replaced wholesale
  * (the reference updates every column), unmatched inserted.
  *
  * Scale notes: the anti join shuffles both sides on the pk unless the
  * source is small enough to broadcast (typical for dim deltas — let
  * AQE decide). [[intoPath]] rewrites only via a staging directory and
  * atomic rename; single-writer batch semantics are documented in lieu
  * of BigQuery's transactional MERGE.
  */
object MergeUpsert {

  /** Pure form: returns target with source upserted on `pks`. */
  def apply(target: DataFrame, source: DataFrame, pks: Seq[String]): DataFrame = {
    val cols = target.columns.toSeq
    target.join(source.select(pks.map(col): _*), pks, "left_anti")
      .unionByName(source.select(cols.map(col): _*))
  }

  /** Upsert into a parquet path with staged write + swap.
    *
    * Rewrites the WHOLE table — fine for small dims, a scale-killer for
    * big partitioned ones; prefer [[intoPartitionedPath]] there. */
  def intoPath(spark: SparkSession, path: String, source: DataFrame,
               pks: Seq[String]): Unit = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged =
      if (fs.exists(target)) apply(spark.read.parquet(path), source, pks)
      else source
    val tmp = new Path(path + "__staging")
    staged.write.mode("overwrite").parquet(tmp.toString)
    val old = new Path(path + "__old")
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(tmp, target)
    fs.delete(old, true)
  }

  /** Partition-scoped upsert into a table laid out
    * `partitionBy(partitionCol)`: only partitions that contain matched
    * keys (rows being replaced) or receive source rows are rewritten;
    * every other partition directory is left byte-identical.
    *
    * At 100 TB this is the difference between rewriting a day slice and
    * rewriting the table: the semi join that finds touched partitions
    * prunes to partition-count cardinality (metadata scale — collecting
    * the distinct partition VALUES to the driver is bounded by the
    * partition count, never row count), and the keep-side scan reads
    * only the touched partitions (partition filter pushed to the scan).
    *
    * Not transactional across partitions (each swap is an atomic
    * rename, the sequence is not) — same single-writer batch contract
    * as [[intoPath]]; a Delta-style log would add multi-partition
    * atomicity. */
  def intoPartitionedPath(spark: SparkSession, path: String, source: DataFrame,
                          pks: Seq[String],
                          partitionCol: String = "partition_value"): Unit = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(target)) {
      source.write.partitionBy(partitionCol).parquet(path)
      return
    }
    val t = spark.read.parquet(path)
    val srcKeys = source.select(pks.map(col): _*)
    // touched = partitions holding rows the source replaces PLUS
    // partitions the source writes into (an insert landing in an
    // existing partition must not clobber its resident rows) — a
    // partition-count-sized distinct either way
    val touchedAll = (t.join(srcKeys, pks, "left_semi")
        .select(col(partitionCol))
      unionByName source.select(col(partitionCol)))
      .distinct().collect().map(_.get(0))
    val touchedRaw = touchedAll.filter(_ != null)
    val touchedHasNull = touchedAll.exists(_ == null)
    // directory names use Spark's own escaping (special chars, and the
    // __HIVE_DEFAULT_PARTITION__ null sentinel) so the swap and the
    // stale-dir cleanup match what the writer actually produced
    val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName _
    val touched = touchedRaw.map(v =>
      s"${esc(partitionCol)}=${esc(String.valueOf(v))}") ++
      (if (touchedHasNull) Seq(s"${esc(partitionCol)}=__HIVE_DEFAULT_PARTITION__")
       else Nil)
    // survivors inside touched partitions + all source rows; the typed
    // isin on partitionCol prunes the keep-side scan to touched
    // partitions (null partition handled explicitly — isin is never
    // true for null)
    val touchedPred =
      if (touchedHasNull)
        col(partitionCol).isin(touchedRaw.toSeq: _*) || col(partitionCol).isNull
      else col(partitionCol).isin(touchedRaw.toSeq: _*)
    val keep = t.filter(touchedPred).join(srcKeys, pks, "left_anti")
    val out = keep.unionByName(source.select(t.columns.map(col): _*))
    // stage fully (materializes out BEFORE any target mutation)...
    val tmp = new Path(path + "__merge_staging")
    out.write.mode("overwrite").partitionBy(partitionCol).parquet(tmp.toString)
    // ...then swap exactly the staged partitions
    val stagedDirs = fs.listStatus(tmp)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partitionCol + "="))
    val stagedNames = stagedDirs.map(_.getPath.getName).toSet
    stagedDirs.foreach { s =>
      val dest = new Path(target, s.getPath.getName)
      if (fs.exists(dest)) fs.delete(dest, true)
      fs.rename(s.getPath, dest)
    }
    // a touched partition whose rows ALL matched and got no replacements
    // stages nothing — drop its stale directory explicitly
    touched.filterNot(stagedNames).foreach { name =>
      fs.delete(new Path(target, name), true)
    }
    fs.delete(tmp, true)
  }
}
