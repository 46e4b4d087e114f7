package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.functions.Exact.dec

/** Structured Streaming pipelines over the events stream (SURVEY.md
  * ST1-ST4).
  *
  * The reference's "streaming" is a 5-minute cron micro-batch
  * (reference: dags/etl/run_etl.py:28, dags/ingestion/lark_to_gcs.py:101);
  * here the same workloads are real streams: file-source micro-batches,
  * event-time watermarks for late data, windowed aggregation, and
  * stateful sessionization via flatMapGroupsWithState. The aggregation
  * bodies are IDENTICAL expressions to the batch queries
  * ([[graft.analytics.EventsQueries]]) — batch output is the oracle for
  * the streaming path (tested in EventPipelinesSpec).
  */
object EventPipelines {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionState(startSec: Long, lastSec: Long, nEvents: Int,
                                nPurchases: Int)

  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           duration_sec: Long, n_events: Long, n_purchases: Long)

  /** The events parquet schema as the file source needs it declared,
    * parameterized on the physical `ts` type at rest — the driver has
    * shipped TIMESTAMP(NANOS) (read as epoch-nanos long) and
    * TIMESTAMP(MICROS) without UTC adjustment (read as TIMESTAMP_NTZ)
    * across rounds, and a streaming source must declare the one the
    * files actually hold. */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream of events with `ts` as a second-truncated
    * timestamp (matching [[graft.core.Tables.events]]). Accepts either
    * a directory of parquet files or a single `.parquet` file. The
    * physical `ts` type is peeked from the parquet footer via a batch
    * read (one driver-side footer fetch — no data scan), then
    * normalized exactly like the batch loader so streaming and batch
    * twins agree bit-for-bit. A landing directory with no files yet
    * (the normal way a stream starts) can't be peeked — the declared
    * type falls back to the current at-rest generation
    * (TIMESTAMP_NTZ) so the stream starts and picks files up as they
    * land instead of failing at setup. */
  def readEventStream(spark: SparkSession, path: String): DataFrame = {
    val tsType =
      try spark.read.parquet(path).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => TimestampNTZType }
    val reader = spark.readStream.schema(rawSchema(tsType))
    val src =
      if (path.endsWith(".parquet")) {
        val i = path.lastIndexOf('/')
        val (dir, file) =
          if (i < 0) (".", path) else (path.substring(0, i), path.substring(i + 1))
        reader.option("pathGlobFilter", file).parquet(dir)
      } else reader.parquet(path)
    val norm = tsType match {
      case LongType         => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case _                => col("ts")
    }
    src.withColumn("ts", date_trunc("second", norm))
  }

  /** Streaming twin of q20: 1-hour tumbling windows x event_type,
    * 2-hour event-time watermark bounds state. */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(dec(col("value"), 18, 2)).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))

  /** Streaming frequent items per event-time window: the Misra–Gries
    * sketch ([[graft.functions.MisraGries]]) as the aggregate of a
    * watermarked windowed group-by. The sketch's serialized buffer IS
    * the state-store value, so state per open window is ≤k counters —
    * fixed — no matter how many distinct items stream through (a
    * `groupBy(window, item)` count would grow state with the live
    * vocabulary until the watermark closes the window). Same
    * guarantee as batch: any item above N/(k+1) of the window's
    * traffic is present; estimates undercount by ≤ N/(k+1). */
  def windowedHeavyHitters(events: DataFrame, k: Int = 8,
                           win: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win))
      .agg(graft.functions.Native.misraGries(col("event_type"), k).as("mg"))
      .select(col("window.start").as("window_start"),
        explode(col("mg")).as("c"))
      .select(col("window_start"), col("c.item").as("item"),
        col("c.est").as("est"))

  /** Streaming value-quantile monitor: per event-time window, p50/p95/
    * p99 of the event value (integer cents) from the mergeable
    * [[graft.functions.HdrHistogram]] sketch — the streaming face of
    * q138. The state-store value per open window is the ≤ ~1k-counter
    * histogram buffer, FIXED no matter how many events stream through
    * (an exact streaming percentile would hold every value in state
    * until the watermark closes the window); estimates are bucket
    * upper edges, ≤ 6.25 % high, and — because the sketch merges by
    * addition — bit-identical to the batch aggregate over the same
    * rows (EventPipelinesSpec pins batch/stream equality). */
  def windowedValueQuantiles(events: DataFrame, win: String = "1 day",
                             watermark: String = "2 days"): DataFrame = {
    import graft.functions.Native
    val hist = events
      .withColumn("cents", (dec(col("value"), 18, 2) * 100).cast("long"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win))
      .agg(Native.hdrHistogram(col("cents")).as("h"))
    hist.select(col("window.start").as("window_start"),
      Native.histogramQuantile(col("h"), 50).as("p50_hi_cents"),
      Native.histogramQuantile(col("h"), 95).as("p95_hi_cents"),
      Native.histogramQuantile(col("h"), 99).as("p99_hi_cents"))
  }

  /** Streaming exact dedup: drop replayed event ids inside the
    * watermark horizon — the streaming tier of the dedup ladder
    * (at-least-once sources -> exactly-once rows downstream). State is
    * bounded by the watermark: ids older than it age out. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id", "ts")

  /** Streaming dedup on the ID ALONE, tolerating re-stamped replays:
    * at-least-once sources often re-emit an event with a fresh
    * timestamp, which `dropDuplicates(id, ts)` cannot catch (the key
    * differs) and `dropDuplicates(id)` alone would catch only with
    * unbounded state. `dropDuplicatesWithinWatermark` is the bounded
    * middle: one state row per id, evicted once the watermark passes
    * `ts + delay`, so a replay inside the delay window dedups even
    * when its `ts` moved, and state stays O(ids per delay window) —
    * the guarantee that makes the operator safe on an infinite
    * stream. First arrival wins; output carries the winner's row. */
  def dedupStreamWithinWatermark(events: DataFrame,
                                 delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /** ST3 streaming-native: land each micro-batch into the lake by keyed
    * merge — the streaming twin of the reference's 5-minute cron merge
    * publish (etl.py:539-565). `foreachBatch` runs the SAME
    * [[graft.operators.MergeUpsert.intoPartitionedPath]] the batch
    * pipeline uses, once per epoch; replayed epochs re-merge the same
    * keys, so the sink is idempotent (effectively exactly-once). */
  def mergeStream(events: DataFrame, path: String, pks: Seq[String],
                  orderCol: String = "ts"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events
      .withColumn("partition_value", to_date(col("ts")))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one epoch can carry the same pk twice — redelivery, or a
        // catch-up batch folding an original AND its update. The merge
        // must see each pk once, and the winner must be deterministic:
        // max_by on `orderCol` keeps the LATEST version (dropDuplicates
        // would keep an arbitrary row and could land the stale one)
        val cols = batch.columns.toSeq
        val deduped = batch.groupBy(pks.map(col): _*)
          .agg(max_by(struct(cols.map(col): _*), col(orderCol)).as("__r"))
          .select(cols.map(c => col(s"__r.$c").as(c)): _*)
        if (!deduped.isEmpty)
          graft.operators.MergeUpsert.intoPartitionedPath(
            batch.sparkSession, path, deduped, pks)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())

  /** ST4 stream-stream interval join: attribute each purchase to the
    * clicks by the same user in the `windowMin` minutes before it.
    * Both sides carry event-time watermarks and the join condition
    * time-bounds each side against the other, so Spark derives a state
    * eviction horizon — buffered clicks age out `windowMin` + watermark
    * behind the purchase stream instead of accumulating forever (the
    * defining requirement of a stream-stream join; without the time
    * bound the state is unbounded and the job dies at scale). Inner
    * join: Append-mode output, one row per (click, purchase) pair.
    * Batch twin (the oracle-checked aggregate view): q84
    * [[graft.analytics.EventsQueries.clickAttribution]]. */
  def purchaseAttribution(clicks: DataFrame, purchases: DataFrame,
                          windowMin: Int = 30,
                          watermark: String = "1 hour"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
        col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("event_id").as("purchase_id"),
        col("value"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") > col("purchase_ts") - expr(s"INTERVAL $windowMin MINUTES"))
      .select(col("p_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** LEFT OUTER tier of [[purchaseAttribution]]: every purchase emits —
    * attributed rows as they match, UNMATCHED purchases (null click
    * columns) once the watermark proves no in-window click can still
    * arrive. The outer side is the semantically harder stream-stream
    * regime: the engine must hold each purchase in state until the
    * click-side watermark passes its join window before it may emit
    * the null row, which is exactly why BOTH sides carry watermarks
    * and the join condition is time-bounded on both ends — without
    * them the null rows could never be proven final (Spark rejects
    * the query). Same state-eviction horizon as the inner tier. */
  def purchaseAttributionOuter(clicks: DataFrame, purchases: DataFrame,
                               windowMin: Int = 30,
                               watermark: String = "1 hour"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
        col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("event_id").as("purchase_id"),
        col("value"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") > col("purchase_ts") - expr(s"INTERVAL $windowMin MINUTES"),
      "left_outer")
      .select(col("p_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Streaming sessionization (twin of q22): >30-minute event-time gap
    * closes a session. State per user; sessions emit when the watermark
    * passes their gap timeout — late events within the watermark still
    * join their session. */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapSec: Long = 1800): Dataset[Session] = {
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
                  col("event_type"), col("value"))
      .withWatermark("ts", "1 hour")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val events = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          if (events.isEmpty && state.hasTimedOut) {
            // watermark passed the gap: close and emit the session
            val s = state.get
            state.remove()
            Iterator.single(Session(userId,
              new java.sql.Timestamp(s.startSec * 1000),
              s.lastSec - s.startSec, s.nEvents, s.nPurchases))
          } else {
            var closed = List.empty[Session]
            var cur = state.getOption
            events.foreach { e =>
              val sec = e.ts.getTime / 1000
              val purchase = if (e.event_type == "purchase") 1 else 0
              cur match {
                case Some(s) if sec - s.lastSec <= gapSec =>
                  // merge; a late event above the watermark may land
                  // BEFORE the session's current bounds — extend, never
                  // regress them (a regressed lastSec would wrongly
                  // split the session on the next on-time event)
                  cur = Some(s.copy(
                    startSec = math.min(s.startSec, sec),
                    lastSec = math.max(s.lastSec, sec),
                    nEvents = s.nEvents + 1,
                    nPurchases = s.nPurchases + purchase))
                case Some(s) =>
                  closed ::= Session(userId, new java.sql.Timestamp(s.startSec * 1000),
                    s.lastSec - s.startSec, s.nEvents, s.nPurchases)
                  cur = Some(SessionState(sec, sec, 1, purchase))
                case None =>
                  cur = Some(SessionState(sec, sec, 1, purchase))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSec * 1000 + gapSec * 1000 + 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
