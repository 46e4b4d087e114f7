package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the test star schema (see /root/repo/TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst pushdown (filters,
  * column pruning, partition pruning on partitioned layouts) applies
  * transparently to every query built on top.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` truncated to whole seconds.
    *
    * The raw parquet stores nanosecond timestamps; Spark reads them at
    * microsecond precision while other engines keep nanoseconds, so any
    * query that surfaces or compares `ts` works on the second-truncated
    * column for cross-engine determinism. Sub-second ordering is never
    * semantically meaningful in the event data (tie-break on event_id).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events").withColumn("ts", date_trunc("second", col("ts")))
}
