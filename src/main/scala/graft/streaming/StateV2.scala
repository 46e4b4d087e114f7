package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import EventPipelines.{Event, Session, SessionState}

/** Spark 4 arbitrary-stateful streaming via `transformWithState` —
  * the state-v2 twin of [[EventPipelines.sessionize]]'s
  * `flatMapGroupsWithState` path, with IDENTICAL session semantics
  * (same gap rule, same late-event bound extension, same timeout
  * instant), pinned by a parity test against the v1 operator.
  *
  * What v2 buys at scale:
  *   - typed, NAMED state slots (`getValueState("session", ...)`) —
  *     a processor can hold several independently-encoded states and
  *     evolve them separately, where v1 squeezes everything into one
  *     state class;
  *   - first-class timers (`registerTimer`/`handleExpiredTimer`)
  *     decoupled from input arrival, rather than v1's single
  *     per-group timeout slot;
  *   - per-state TTL (`TTLConfig`) enforced by the store itself;
  *   - requires the RocksDB state store provider, whose changelog
  *     checkpointing + off-heap working set is the 100 TB posture
  *     anyway (per-executor state no longer bounded by JVM heap).
  *
  * Caller contract: the session running the stream must set
  * `spark.sql.streaming.stateStore.providerClass` to
  * `...state.RocksDBStateStoreProvider` (transformWithState refuses
  * the HDFS-backed default).
  */
object StateV2 {

  /** Event-time sessionizer as a [[StatefulProcessor]]: one ValueState
    * slot holds the open session; a single event-time timer at
    * `lastSec + gap + 1s` (kept in sync on every input batch) closes
    * and emits it when the watermark passes. Mid-batch gap violations
    * close sessions inline, exactly like v1. */
  final class SessionProcessor(gapSec: Long)
      extends StatefulProcessor[Long, Event, Session] {

    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    private def emit(userId: Long, s: SessionState): Session =
      Session(userId, new java.sql.Timestamp(s.startSec * 1000),
        s.lastSec - s.startSec, s.nEvents, s.nPurchases)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[Session] = {
      val events = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var closed = List.empty[Session]
      var cur = if (session.exists()) Some(session.get()) else None
      events.foreach { e =>
        val sec = e.ts.getTime / 1000
        val purchase = if (e.event_type == "purchase") 1 else 0
        cur match {
          case Some(s) if sec - s.lastSec <= gapSec =>
            // late-but-above-watermark events may land BEFORE the
            // session bounds: extend, never regress (v1 rule)
            cur = Some(s.copy(
              startSec = math.min(s.startSec, sec),
              lastSec = math.max(s.lastSec, sec),
              nEvents = s.nEvents + 1,
              nPurchases = s.nPurchases + purchase))
          case Some(s) =>
            closed ::= emit(userId, s)
            cur = Some(SessionState(sec, sec, 1, purchase))
          case None =>
            cur = Some(SessionState(sec, sec, 1, purchase))
        }
      }
      cur.foreach { s =>
        session.update(s)
        // one live timer per key: re-arm at the new session end
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(s.lastSec * 1000 + gapSec * 1000 + 1000)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] =
      if (!session.exists()) Iterator.empty
      else {
        val s = session.get()
        session.clear()
        Iterator.single(emit(userId, s))
      }
  }

  final case class VelocityAlert(user_id: Long, window_start: java.sql.Timestamp,
                                 window_end: java.sql.Timestamp, n_purchases: Long)

  /** Purchase-velocity monitor — the ListState face of the state-v2
    * API: per user, a bounded list of recent purchase times; when
    * `minPurchases` land inside `windowSec`, ONE alert emits for that
    * burst (the burst's times are consumed, so a sustained burst
    * alerts once per `minPurchases` arrivals, not per event). The
    * list is trimmed to `retainSec` behind the newest seen time —
    * `retainSec` must be >= the source watermark delay, because a
    * LATE purchase inside the watermark may complete a burst with
    * times older than `windowSec` (trimming at the window width
    * would silently drop them and miss genuine bursts); live state is
    * therefore O(purchases per retainSec) per ACTIVE user. A user who
    * goes silent keeps their last trimmed list until eviction: in
    * production pass `TimeMode.ProcessingTime` and swap
    * `TTLConfig.NONE` for `TTLConfig(Duration.ofSeconds(windowSec*2))`
    * — the store then evicts idle users itself (TTL requires the
    * processing-time mode; it bounds state SIZE, not semantics). The
    * spec pins `TimeMode.None` because processing-time no-data-batch
    * scheduling does not settle under `processAllAvailable` here. */
  final class VelocityProcessor(windowSec: Long, minPurchases: Int,
                                retainSec: Long,
                                ttl: Option[java.time.Duration] = None)
      extends StatefulProcessor[Long, Event, VelocityAlert] {

    @transient private var times: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      times = getHandle.getListState[Long]("purchase_times",
        Encoders.scalaLong, ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[VelocityAlert] = {
      val incoming = rows.filter(_.event_type == "purchase")
        .map(_.ts.getTime / 1000).toSeq.sorted
      if (incoming.isEmpty) return Iterator.empty
      var held = (times.get().toSeq ++ incoming).sorted
      val alerts = scala.collection.mutable.ListBuffer.empty[VelocityAlert]
      var continue = true
      while (continue && held.length >= minPurchases) {
        // earliest window of minPurchases events that fits in windowSec
        val i = held.indices.find(i => i + minPurchases - 1 < held.length &&
          held(i + minPurchases - 1) - held(i) <= windowSec)
        i match {
          case Some(start) =>
            val burst = held.slice(start, start + minPurchases)
            alerts += VelocityAlert(userId,
              new java.sql.Timestamp(burst.head * 1000),
              new java.sql.Timestamp(burst.last * 1000), minPurchases.toLong)
            // consume ONLY the burst slice: times before the burst
            // stay held — a late purchase inside the watermark may
            // yet complete a window with them (the retainSec horizon
            // below, not burst consumption, ages them out)
            held = held.take(start) ++ held.drop(start + minPurchases)
          case None => continue = false
        }
      }
      // retain the full late-data horizon, not just the window (a
      // late purchase may yet complete a burst with these times)
      val horizon = held.lastOption.getOrElse(incoming.last) - retainSec
      val kept = held.filter(_ >= horizon)
      times.clear()
      if (kept.nonEmpty) times.appendList(kept.toArray)
      alerts.iterator
    }
  }

  /** Velocity alerts over the standard event frame. With `ttl` set,
    * the store itself evicts idle users' state (the production
    * posture: live state stays O(active users), silent users cost
    * nothing) — TTL requires `TimeMode.ProcessingTime`, so the query
    * must run under a scheduler that settles no-data batches (a real
    * file/Kafka source; `MemoryStream.processAllAvailable` does not —
    * StateV2Spec drives the TTL path with a file source and
    * per-batch restarts instead). Without `ttl` the processor trims
    * manually to `retainSec` under `TimeMode.None`. */
  def purchaseVelocityAlerts(spark: SparkSession,
                             events: org.apache.spark.sql.DataFrame,
                             windowSec: Long = 600,
                             minPurchases: Int = 3,
                             retainSec: Long = 3600,
                             ttl: Option[java.time.Duration] = None): Dataset[VelocityAlert] = {
    require(retainSec >= windowSec,
      s"retainSec ($retainSec) must cover windowSec ($windowSec)")
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withWatermark("ts", "1 hour") // matches the default retainSec
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(
        new VelocityProcessor(windowSec, minPurchases, retainSec, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  final case class HeavyUser(event_type: String, user_id: Long,
                             weight_low: Long, as_of_sec: Long)

  /** Streaming Misra–Gries heavy hitters — the MAPSTATE face of the
    * state-v2 API (the fourth shape: sessionizer = open aggregate,
    * velocity = bounded list, transitions = single row, this = bounded
    * MAP): per event type, which users dominate the stream, maintained
    * incrementally with AT MOST `k` counters per key regardless of how
    * many distinct users flow through — the same guarantee as the
    * batch [[graft.functions.MisraGries]] aggregate (q91): any user
    * with frequency > n/(k+1) is guaranteed present, and each
    * surviving counter lower-bounds the user's true count by at most
    * the total decrement damage.
    *
    * Emission contract: one SNAPSHOT per (event_type, batch) — every
    * surviving counter stamped `as_of_sec` = the newest event second
    * seen for that key, so downstream reads the latest stamp per type
    * (or the full history as a time series of the leaderboard).
    * Batches fold in (ts, event_id) order, so a replayed epoch
    * produces the identical snapshot (idempotent replay, same
    * discipline as the velocity monitor). Live state is O(k) longs per
    * event type — at 100 TB of stream this never grows; in production
    * add a `TTLConfig` exactly as [[VelocityProcessor]] documents. */
  final class HeavyUsersProcessor(k: Int)
      extends StatefulProcessor[String, Event, HeavyUser] {

    @transient private var counters:
      org.apache.spark.sql.streaming.MapState[Long, Long] = _
    @transient private var asOf: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[Long, Long]("mg_counters",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      asOf = getHandle.getValueState[Long]("as_of",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(tpe: String, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[HeavyUser] = {
      val events = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      if (events.isEmpty) return Iterator.empty
      // fold through a driver-local mirror: the MG decrement step
      // touches every counter, and k store round-trips per input row
      // would dominate — one read + one write per batch instead
      val m = scala.collection.mutable.Map.empty[Long, Long]
      counters.iterator().foreach { case (u, c) => m(u) = c }
      events.foreach { e =>
        val u = e.user_id
        if (m.contains(u)) m(u) += 1L
        else if (m.size < k) m(u) = 1L
        else {
          // decrement all; drop zeros (the classic MG step)
          m.mapValuesInPlace((_, c) => c - 1L)
          m.filterInPlace((_, c) => c > 0L)
        }
      }
      counters.clear()
      m.foreach { case (u, c) => counters.updateValue(u, c) }
      val newest = math.max(events.last.ts.getTime / 1000,
        if (asOf.exists()) asOf.get() else Long.MinValue)
      asOf.update(newest)
      m.toSeq.sortBy { case (u, c) => (-c, u) }
        .map { case (u, c) => HeavyUser(tpe, u, c, newest) }.iterator
    }
  }

  /** Streaming heavy users per event type — see
    * [[HeavyUsersProcessor]]. */
  def heavyUsersV2(spark: SparkSession,
                   events: org.apache.spark.sql.DataFrame,
                   k: Int = 8): Dataset[HeavyUser] = {
    require(k >= 1, s"k ($k) must be >= 1")
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withWatermark("ts", "1 hour")
      .as[Event]
      .groupByKey(_.event_type)
      .transformWithState(new HeavyUsersProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }

  final case class Transition(user_id: Long, prev: String, next: String)

  /** The last event seen per user — all a first-order chain needs. */
  final case class LastEvent(sec: Long, event_id: Long, tpe: String)

  /** Streaming twin of `EventsQueries.markovTransitions` (q131): one
    * `prev → next` record per consecutive event pair in each user's
    * stream, emitted incrementally — a downstream
    * `groupBy(prev, next).count()` maintains the transition matrix
    * with no reprocessing of history. A third state shape for the
    * v2 API: the smallest possible per-key state (ONE row — the last
    * event), vs the sessionizer's open-aggregate and the velocity
    * monitor's list.
    *
    * Ordering contract: rows are sorted by `(ts, event_id)` WITHIN a
    * batch (same tiebreak as the batch query), and chained across
    * batches through the ValueState — so with per-user in-order
    * arrival across batches the emitted pairs are exactly the batch
    * query's lag pairs (pinned by the parity spec). Cross-batch
    * out-of-order arrival links in arrival order — the documented
    * incremental trade-off, same as any chained-state stream. */
  final class TransitionProcessor
      extends StatefulProcessor[Long, Event, Transition] {

    @transient private var last: ValueState[LastEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastEvent](
        "last", Encoders.product[LastEvent], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[Transition] = {
      val events = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var prev = if (last.exists()) Some(last.get()) else None
      val out = Seq.newBuilder[Transition]
      events.foreach { e =>
        prev.foreach(p => out += Transition(userId, p.tpe, e.event_type))
        prev = Some(LastEvent(e.ts.getTime / 1000, e.event_id, e.event_type))
      }
      prev.foreach(last.update)
      out.result().iterator
    }
  }

  /** Streaming per-user event transitions — see [[TransitionProcessor]]. */
  def transitionsV2(spark: SparkSession,
                    events: org.apache.spark.sql.DataFrame): Dataset[Transition] = {
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withWatermark("ts", "1 hour")
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming sessionization over the standard event frame —
    * drop-in replacement for [[EventPipelines.sessionize]] (same
    * input/output contract, same watermark). */
  def sessionizeV2(spark: SparkSession, events: org.apache.spark.sql.DataFrame,
                   gapSec: Long = 1800): Dataset[Session] = {
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withWatermark("ts", "1 hour")
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSec),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
