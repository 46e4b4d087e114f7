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

  /** `events` with `ts` as a microsecond TIMESTAMP.
    *
    * The raw parquet stores TIMESTAMP(NANOS), which Spark has no type
    * for — the session reads it as an epoch-nanos long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and this loader truncates
    * to microseconds, exactly what engines with native ns support do
    * when casting down to a µs timestamp. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** `events` with `ts` truncated to whole seconds: queries that
    * surface or compare `ts` use this for cross-engine determinism
    * (sub-second ordering is never semantically meaningful in the event
    * data — ties break on event_id). */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRaw(spark, dir).withColumn("ts", date_trunc("second", col("ts")))
}
