package graft.sources

import java.time.LocalDate
import scala.util.control.NonFatal
import org.apache.spark.sql.SparkSession
import graft.ingest.IngestionState
import graft.warehouse.Pipeline

/** The reference's two DAGs as one entry point (ingestion_lark_to_gcs
  * -> run_etl): discover tables, incrementally land each, then run the
  * medallion build for the partition. Tables ingest independently (the
  * reference fans them out as dynamic Airflow tasks; here a par
  * collection would do the same — kept sequential for deterministic
  * logs, the per-table work is already distributed).
  *
  * Failure policy mirrors Airflow's (reference: dags/etl/run_etl.py:
  * 19-30): each table retries `retries` times with `retryDelayMs`
  * backoff; a table that exhausts its retries is reported through the
  * notifier, the REMAINING tables still ingest (independent tasks), and
  * the run then fails before the warehouse build — a partial landing
  * must not publish as a complete partition.
  */
object IngestJob {

  def run(spark: SparkSession, client: LarkClient, landingDir: String,
          lakeDir: String, statePath: String, runDate: LocalDate,
          notifier: IngestNotifier = LogNotifier,
          retries: Int = 1, retryDelayMs: Long = 300000L,
          sleep: Long => Unit = Thread.sleep): Unit = {
    val jobName = s"lark-ingest-$runDate"
    IngestNotifier.notifying(notifier, jobName) {
      val state = new IngestionState(statePath)
      // a broken notifier must never change the ingestion outcome: the
      // retry loop and the remaining-tables policy answer to the DATA
      // errors; notification failures are best-effort. Retry.withBackoff
      // already guards its onRetry hook; tell() covers the direct sends.
      def tell(msg: String): Unit =
        try notifier.notify(msg) catch { case NonFatal(_) => }
      def retrying[T](what: String)(body: => T): T =
        Retry.withBackoff(retries, retryDelayMs, sleep,
          onRetry = (n, e) => notifier.notify(
            s"[$jobName] $what attempt $n failed, retrying: ${e.getMessage}"))(body)
      val tables = retrying("table discovery")(LarkSource.discoverTables(client))
      val failed = tables.flatMap { t =>
        try {
          retrying(s"table ${t.tableId}") {
            LarkSource.ingestIncremental(client, state, t.tableId, landingDir,
              runDate, spark)
          }
          None
        } catch {
          case NonFatal(e) =>
            tell(
              s"[$jobName] table ${t.tableId} FAILED after $retries retries: ${e.getMessage}")
            Some(t.tableId -> e)
        }
      }
      if (failed.nonEmpty)
        throw new IllegalStateException(
          s"ingestion failed for ${failed.map(_._1).mkString(", ")}; " +
            "skipping the warehouse build for this partition", failed.head._2)
      new Pipeline(spark, landingDir, lakeDir).run(runDate.toString)
    }
  }
}
