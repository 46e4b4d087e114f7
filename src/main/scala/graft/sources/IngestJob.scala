package graft.sources

import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import graft.ingest.IngestionState
import graft.warehouse.Pipeline

/** The reference's two DAGs as one entry point (ingestion_lark_to_gcs
  * -> run_etl): discover tables, incrementally land each, then run the
  * medallion build for the partition. Tables ingest independently (the
  * reference fans them out as dynamic Airflow tasks; here a par
  * collection would do the same — kept sequential for deterministic
  * logs, the per-table work is already distributed).
  */
object IngestJob {

  def run(spark: SparkSession, client: LarkClient, landingDir: String,
          lakeDir: String, statePath: String, runDate: LocalDate,
          notifier: IngestNotifier = LogNotifier): Unit =
    IngestNotifier.notifying(notifier, s"lark-ingest-$runDate") {
      val state = new IngestionState(statePath)
      LarkSource.discoverTables(client).foreach { t =>
        LarkSource.ingestIncremental(client, state, t.tableId, landingDir,
          runDate, spark)
      }
      new Pipeline(spark, landingDir, lakeDir).run(runDate.toString)
    }
}
