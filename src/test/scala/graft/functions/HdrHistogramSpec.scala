package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.analytics.MiningQueries
import graft.streaming.EventPipelines

/** The native histogram aggregate must agree bit-for-bit with q138's
  * relational bucket walk, merge order-independently, and serve the
  * streaming quantile monitor with batch-equal results. */
class HdrHistogramSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def orderCents = graft.core.Tables.load(spark, dir, "orders")
    .select(col("o_orderpriority").as("pri"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("cents"))

  test("aggregate + quantile walk == q138's relational form, bit for bit") {
    val viaAgg = orderCents.groupBy(col("pri"))
      .agg(Native.hdrHistogram(col("cents")).as("h"),
        count(lit(1)).as("n"))
      .select(col("pri"), col("n"),
        Native.histogramQuantile(col("h"), 50).as("p50_hi_cents"),
        Native.histogramQuantile(col("h"), 95).as("p95_hi_cents"),
        Native.histogramQuantile(col("h"), 99).as("p99_hi_cents"))
      .orderBy(col("pri")).collect().toSeq
    val viaQuery = MiningQueries.histogramQuantiles(spark, dir).collect().toSeq
    assert(viaAgg.map(_.toSeq) == viaQuery.map(_.toSeq))
  }

  test("partitioning cannot change the histogram (merge = addition)") {
    def hist(parts: Int) = orderCents.repartition(parts)
      .agg(Native.hdrHistogram(col("cents")).as("h"))
      .select(to_json(col("h"))).head().getString(0)
    assert(hist(1) == hist(13))
  }

  test("bucket function: exact below 16, 6.25% bound above") {
    for (v <- Seq(0L, 1L, 15L)) {
      assert(HdrHistogram.bucketOf(v) == v.toInt)
      assert(HdrHistogram.upperEdge(HdrHistogram.bucketOf(v)) == v)
    }
    for (v <- Seq(16L, 17L, 255L, 1L << 40, (1L << 40) + 12345L, Long.MaxValue)) {
      val hi = HdrHistogram.upperEdge(HdrHistogram.bucketOf(v))
      assert(hi >= v, s"$v: upper edge $hi below value")
      assert(hi - v <= v / 16, s"$v: error ${hi - v} above v/16")
    }
  }

  test("sql-text surface resolves via GraftExtensions") {
    val got = spark.sql(
      "SELECT hdr_histogram(v) FROM VALUES (5L),(5L),(100L) AS t(v)")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(got.map(r => (r.getLong(0), r.getLong(2))) ==
      Seq((5L, 2L), (HdrHistogram.bucketOf(100L).toLong, 1L)))
  }

  test("negative input fails fast") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(-1L).toDF("v").agg(Native.hdrHistogram(col("v"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("streaming windowed quantiles == the same aggregate run as batch") {
    val stream = EventPipelines.readEventStream(spark, s"$dir/events.parquet")
    val q = EventPipelines.windowedValueQuantiles(stream)
      .writeStream.format("memory").queryName("wq")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("wq").orderBy("window_start")
    val want = EventPipelines.windowedValueQuantiles(
      graft.core.Tables.events(spark, dir))
      .orderBy("window_start")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
    q.stop()
  }
}
