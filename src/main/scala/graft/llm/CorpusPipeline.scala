package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed curation pipeline — the end-to-end program a training
  * team actually runs, wired from the individually oracle-checked
  * stages: quality screen → dedup ladder → test-set decontamination →
  * deterministic split → sequence packing. One call, one annotated
  * output row per INPUT document (curation decisions must be
  * auditable — a dropped doc carries its reason, never silently
  * vanishes).
  *
  * Stage order is the standard one and it matters for cost: quality
  * first (a narrow map that typically drops the most volume before
  * anything shuffles), near-dedup on survivors (the expensive
  * stage — shingles/LSH/verify — runs on the reduced corpus),
  * decontamination next (broadcast of eval grams against an even
  * smaller corpus), then the zero-shuffle split map, and packing
  * (one window per (lang, shard) stream) only over the train slice.
  *
  * `materialize` is the shared scale hook ([[Dedup.dedupCorpus]]'s
  * pattern): each stage's survivor frame feeds both the next stage
  * and the final annotation join, so pass `_.localCheckpoint()` to
  * pin stage boundaries — every stage then scans its input once.
  * Every decision is a pure function of (text, doc_id, eval set) —
  * md5 thresholds, integer arithmetic — so the whole pipeline is
  * deterministic across runs, engines, and partitionings. */
object CorpusPipeline {

  /** Returns one row per input doc:
    * (doc_id, lang, source, quality_score, status, split, bin,
    * start_offset) where status ∈ `kept:train|val|test`,
    * `dropped:quality`, `dropped:<dedup reason>`,
    * `dropped:contaminated`; bin/start_offset only for packed
    * (train) docs. */
  def curate(docs: DataFrame, evalDocs: DataFrame,
             qualityThreshold: Double = 1.0,
             dedupThreshold: Double = 0.5,
             contamN: Int = 5,
             trainPct: Int = 96, valPct: Int = 2,
             capacity: Int = 512, shards: Int = 8,
             materialize: DataFrame => DataFrame = identity,
             bloomDecontam: Boolean = false): DataFrame = {
    val quality = CorpusOps.qualityScore(docs, qualityThreshold)
      .select(col("doc_id"), col("quality_score"), col("keep").as("q_keep"))
    val afterQ = materialize(
      docs.join(quality.filter(col("q_keep")).select("doc_id"), Seq("doc_id")))

    val verdicts = Dedup.dedupCorpus(afterQ, threshold = dedupThreshold,
        materialize = materialize)
      .select(col("doc_id"), col("keep").as("d_keep"), col("drop_reason"))
    val afterD = materialize(
      afterQ.join(verdicts.filter(col("d_keep")).select("doc_id"), Seq("doc_id")))

    // bloomDecontam swaps in the sketch-prefiltered variant — same
    // rows bit for bit (the verify join strips false positives), but
    // executors hold a ~MB bloom instead of the gram-string broadcast
    val contam = (if (bloomDecontam)
        CorpusOps.decontaminateBloom(afterD, evalDocs, contamN,
          materialize = materialize)
      else CorpusOps.decontaminate(afterD, evalDocs, contamN))
      .select(col("doc_id"), col("contaminated"))
    val afterC = materialize(
      afterD.join(contam.filter(!col("contaminated")).select("doc_id"),
        Seq("doc_id")))

    val splits = CorpusOps.hashSplit(afterC, trainPct, valPct)
      .select(col("doc_id"), col("split"))
    val packed = CorpusOps.packSequences(
        afterC.join(splits.filter(col("split") === "train")
          .select("doc_id"), Seq("doc_id")),
        capacity, shards)
      .select(col("doc_id"), col("bin"), col("start_offset"))

    docs.select(col("doc_id"), col("lang"), col("source"))
      .join(quality, Seq("doc_id"), "left")
      .join(verdicts, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .join(splits, Seq("doc_id"), "left")
      .join(packed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"), col("quality_score"),
        // coalesce: a null quality verdict (null text null-propagates
        // through the score arithmetic) must read as a quality DROP,
        // not a null status that vanishes from every accounting slice
        when(!coalesce(col("q_keep"), lit(false)), lit("dropped:quality"))
          .when(!col("d_keep"), concat(lit("dropped:"), col("drop_reason")))
          .when(col("contaminated"), lit("dropped:contaminated"))
          .when(col("split").isNull, lit("error:unaccounted"))
          .otherwise(concat(lit("kept:"), col("split"))).as("status"),
        col("split"), col("bin"), col("start_offset"))
  }
}
