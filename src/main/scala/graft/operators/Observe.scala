package graft.operators

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Single-pass pipeline observability via `Dataset.observe`: named
  * metric expressions ride the SAME job that materializes the frame
  * (the write, the count, the collect) — at 100 TB the alternative is
  * a second full scan per metric batch, which is exactly what a
  * monitoring layer must never cost.
  *
  * Metrics must be aggregate expressions the observer can fold
  * incrementally (count/sum/min/max — the usual accumulator algebra).
  * Harvesting: register a [[Observe.Harvester]] on the session; every
  * completed action surfaces its observation points by name. Works for
  * batch; Structured Streaming surfaces the same observations through
  * `StreamingQueryProgress.observedMetrics` (no separate wiring).
  */
object Observe {

  /** Collects observed metrics from completed query executions.
    * Thread-safe; last write per observation name wins (re-running an
    * action re-observes). `detach()` when done — listeners live on the
    * session. */
  final class Harvester(spark: SparkSession) extends QueryExecutionListener {
    private val seen = new ConcurrentHashMap[String, Row]()
    spark.listenerManager.register(this)

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) => seen.put(name, row) }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()

    /** Observed metric rows by observation name, as of now. Listener
      * delivery is asynchronous — call [[await]] first when the action
      * just returned. */
    def metrics: Map[String, Row] = seen.asScala.toMap

    /** Block (bounded) until an observation with `name` arrives. */
    def await(name: String, timeoutMs: Long = 30000): Option[Row] = {
      val deadline = System.nanoTime + timeoutMs * 1000000L
      while (!seen.containsKey(name) && System.nanoTime < deadline)
        Thread.sleep(20)
      Option(seen.get(name))
    }

    def detach(): Unit = spark.listenerManager.unregister(this)
  }

  /** Attach named metrics to a frame; they evaluate on whatever action
    * eventually runs it. Pure plan decoration — no extra scan, no
    * shuffle, no caching. */
  def audited(df: DataFrame, name: String, metric: Column,
              more: Column*): DataFrame =
    df.observe(name, metric, more: _*)
}
