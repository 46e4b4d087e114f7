package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** Upsert into a parquet path with staged write + swap. */
  def intoPath(spark: SparkSession, path: String, source: DataFrame,
               pks: Seq[String]): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val staged =
      if (fs.exists(target)) apply(spark.read.parquet(path), source, pks)
      else source
    val tmp = new org.apache.hadoop.fs.Path(path + "__staging")
    staged.write.mode("overwrite").parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(tmp, target)
    fs.delete(old, true)
  }
}
