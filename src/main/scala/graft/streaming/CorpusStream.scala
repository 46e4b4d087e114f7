package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.llm.{CorpusOps, TextStats}
import graft.sources.JsonlCorpus

/** Streaming corpus ingestion: the LLM-pipeline twin of the event
  * streams in [[EventPipelines]] — JSONL document shards arrive in a
  * drop directory, each micro-batch is quality-filtered and deduped
  * (in-batch AND against everything already ingested) with the SAME
  * operators the batch pipeline uses ([[TextStats.qualityMetrics]],
  * [[CorpusOps.snapshotDelta]]), then landed as a parquet corpus
  * partitioned by ingest epoch.
  *
  * Exactly-once: each epoch writes ONLY its own `ingest_batch=<id>`
  * partition via dynamic partition overwrite, so a replayed epoch
  * (crash between sink write and checkpoint commit) overwrites its own
  * output instead of duplicating it.
  *
  * Scale shape: the batch side is micro-batch-sized; the corpus side
  * reduces to distinct content hashes inside [[CorpusOps.snapshotDelta]]
  * before anything moves (the ingested TEXT is never reshuffled). At
  * 100 TB the hash set should come from a bucketed hash index
  * maintained alongside the corpus ([[graft.operators.Bucketing]])
  * rather than a full corpus scan per epoch; the seam is
  * `readSnapshot`.
  */
object CorpusStream {

  /** File-source stream of JSONL documents (same declared-schema,
    * corrupt-line-tolerant contract as the batch [[JsonlCorpus]]):
    * malformed lines are counted upstream, never ingested. */
  def readCorpusStream(spark: SparkSession, inPath: String): DataFrame = {
    val withCorrupt = JsonlCorpus.docSchema
      .add(org.apache.spark.sql.types.StructField("_corrupt",
        org.apache.spark.sql.types.StringType))
    spark.readStream
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(inPath)
      .filter(col("_corrupt").isNull)
      .drop("_corrupt")
  }

  /** The corpus already on disk, or an empty frame with the document
    * schema before the first epoch lands. */
  private def readSnapshot(spark: SparkSession, corpusPath: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(corpusPath)))
      spark.read.parquet(corpusPath).drop("ingest_batch")
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        JsonlCorpus.docSchema)
  }

  /** Quality-filter + dedup + land, one epoch at a time. `quality`
    * returns (doc_id, keep) and defaults to the corpus quality gate;
    * swap in [[TextStats.heuristicFilter]] for C4/Gopher rules. */
  def qualityIngest(docs: DataFrame, corpusPath: String,
                    quality: DataFrame => DataFrame = defaultQuality)
      : DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val good = batch.join(
          quality(batch).filter(col("keep")).select("doc_id"), Seq("doc_id"))
        val fresh = good.join(
          CorpusOps.snapshotDelta(good, readSnapshot(spark, corpusPath))
            .filter(col("keep")).select("doc_id"),
          Seq("doc_id"))
        if (!fresh.isEmpty)
          fresh.withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(corpusPath)
      }
      .trigger(Trigger.AvailableNow())

  private def defaultQuality(docs: DataFrame): DataFrame =
    TextStats.qualityMetrics(docs)
      .select(col("doc_id"), col("passes_quality").as("keep"))
}
