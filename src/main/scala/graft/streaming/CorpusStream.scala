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

  /** File-source stream of JSONL documents — the streaming twin of
    * [[JsonlCorpus.readStream]]: malformed lines are counted upstream,
    * never ingested. */
  def readCorpusStream(spark: SparkSession, inPath: String): DataFrame =
    JsonlCorpus.readStream(spark, inPath)

  /** The committed corpus EXCLUDING the replaying epoch's own
    * partition, or an empty frame before the first epoch lands.
    *
    * Two replay hazards live here. (1) A crash mid-commit can leave a
    * PARTIAL `ingest_batch=<id>` partition on disk; if the replay
    * deduped against it, its docs would read as `in_snapshot`, be
    * excluded from the rewrite, and then be DELETED by the dynamic
    * overwrite of that same partition — silent data loss. The current
    * epoch's partition is therefore never part of the snapshot. (2) A
    * crash before any file committed leaves the directory with no
    * readable footer — the schema is declared, never inferred, so the
    * replay proceeds instead of crash-looping on schema inference. */
  private def readSnapshot(spark: SparkSession, corpusPath: String,
                           batchId: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(corpusPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read
        .schema(JsonlCorpus.docSchema.add(
          org.apache.spark.sql.types.StructField("ingest_batch",
            org.apache.spark.sql.types.LongType)))
        .parquet(corpusPath)
        .filter(col("ingest_batch") =!= batchId)
        .drop("ingest_batch")
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
        // checkpoint once: `good` is referenced by the emptiness probe,
        // three times inside snapshotDelta, and by the final write —
        // without it every reference re-reads the JSONL source and
        // re-runs the quality pass
        val good = batch.join(
          quality(batch).filter(col("keep")).select("doc_id"), Seq("doc_id"))
          .localCheckpoint()
        // checkpointed too: the emptiness probe and the write would
        // otherwise each run the snapshot's corpus scan
        val fresh = good.join(
          CorpusOps.snapshotDelta(good, readSnapshot(spark, corpusPath, batchId))
            .filter(col("keep")).select("doc_id"),
          Seq("doc_id"))
          .localCheckpoint()
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

  /** The committed LSH signature index EXCLUDING the replaying epoch's
    * own partition (same two replay hazards as [[readSnapshot]]), or
    * None before the first epoch lands. */
  private def readSigIndex(spark: SparkSession, indexPath: String,
                           batchId: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read
        .schema(sigIndexSchema.add(
          org.apache.spark.sql.types.StructField("ingest_batch",
            org.apache.spark.sql.types.LongType)))
        .parquet(indexPath)
        .filter(col("ingest_batch") =!= batchId)
        .drop("ingest_batch"))
    else None
  }

  private val sigIndexSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("sig",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)),
    org.apache.spark.sql.types.StructField("band",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("bucket",
      org.apache.spark.sql.types.StringType)))

  /** NEAR-dup streaming ingestion: each micro-batch first drops its
    * OWN internal near-dups (min-id survivor,
    * [[graft.llm.Dedup.inBatchNearDupDrops]] — two edited copies in
    * one wave can't both slip past an index that knows neither), then
    * is probed against the LSH signature index of everything already
    * admitted ([[graft.llm.Dedup.dedupAgainstIndexDf]] — catches
    * lightly-edited re-posts that [[qualityIngest]]'s exact content
    * hash misses); survivors land in the corpus AND append their
    * signatures as the epoch's index partition. Both writes are
    * dynamic partition overwrites of the epoch's own
    * `ingest_batch=<id>` partition, so a replayed epoch is idempotent
    * end-to-end — corpus and index can never diverge (the index is
    * derivable from the corpus; a replay rewrites both from the same
    * decisions).
    *
    * Scale shape: the probe broadcasts the micro-batch over ONE index
    * scan; the index is signatures only (k longs + band keys per doc)
    * — per-epoch cost grows with the INDEX, never with stored text,
    * and the index append is batch-sized. The in-batch pass is a
    * batch×batch band-bucket join — micro-batch-sized on both sides. */
  def nearDupIngest(docs: DataFrame, corpusPath: String, indexPath: String,
                    minAgree: Int = 4): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val good = batch.join(
          graft.llm.Dedup.inBatchNearDupDrops(batch, minAgree = minAgree),
          Seq("doc_id"), "left_anti")
          .localCheckpoint()
        val admitted = readSigIndex(spark, indexPath, batchId) match {
          case Some(idx) =>
            good.join(
              graft.llm.Dedup.dedupAgainstIndexDf(idx, good, minAgree = minAgree)
                .filter(!col("is_dup")).select("doc_id"),
              Seq("doc_id"))
          case None => good
        }
        val fresh = admitted.localCheckpoint()
        if (!fresh.isEmpty) {
          fresh.withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(corpusPath)
          graft.llm.Dedup.lshIndexRows(fresh)
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(indexPath)
        }
      }
      .trigger(Trigger.AvailableNow())
}
