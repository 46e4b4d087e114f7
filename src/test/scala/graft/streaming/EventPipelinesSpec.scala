package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.analytics.EventsQueries

class EventPipelinesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly stats == batch q20 (file source, available-now)") {
    val stream = EventPipelines.readEventStream(spark, s"$dir/events.parquet")
    assert(stream.isStreaming)
    val q = EventPipelines.hourlyStats(stream)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("hourly").orderBy("window_start", "event_type")
    val want = EventsQueries.hourlyEventStats(spark, dir)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    q.stop()
  }

  test("stateful sessionization closes sessions at the event-time gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventPipelines.Event]
    val sessions = EventPipelines.sessionize(spark, input.toDF())
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    def ev(id: Long, sec: Long, user: Long, typ: String = "click") =
      EventPipelines.Event(id, new java.sql.Timestamp(sec * 1000), user, typ, 1.0)

    val t0 = 1700000000L
    // session 1: three events for user 7 within 10 minutes
    input.addData(ev(1, t0, 7), ev(2, t0 + 300, 7, "purchase"), ev(3, t0 + 600, 7))
    q.processAllAvailable()
    // a far-future event advances the watermark past the 30-min gap,
    // starting session 2 and timing out session 1
    input.addData(ev(4, t0 + 2 * 3600, 7))
    q.processAllAvailable()
    // one more batch so the timeout (based on the new watermark) fires
    input.addData(ev(5, t0 + 4 * 3600, 7))
    q.processAllAvailable()

    val got = spark.table("sessions").as[EventPipelines.Session].collect()
      .sortBy(_.session_start.getTime)
    assert(got.length >= 1)
    val s1 = got.head
    assert(s1.user_id === 7L)
    assert(s1.session_start.getTime === t0 * 1000)
    assert(s1.duration_sec === 600L)
    assert(s1.n_events === 3L)
    assert(s1.n_purchases === 1L)
    q.stop()
  }
}
