package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout for co-located joins (SURVEY.md §4.3 scale
  * posture).
  *
  * Writing both sides of a recurring join bucketed (and sorted) on the
  * join key hash-partitions the DATA AT REST: the join then reads
  * matching buckets pairwise with no shuffle exchange — at 100 TB this
  * turns the nightly fact/dim or fact/fact join from the dominant
  * shuffle into a local merge per bucket. The bucket count is the at-
  * rest parallelism: pick ~2-4x cluster cores for the biggest table.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted catalog table, stamped with the
    * content fingerprint of `df`'s at-rest sources
    * ([[graft.llm.IndexStamp]]) so derived-index readers can detect a
    * corpus that moved after the build and refuse instead of silently
    * answering stale. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit = {
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)
    graft.llm.IndexStamp.stamp(df.sparkSession, table, df)
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free
    * when bucket counts match. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String,
                    joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
