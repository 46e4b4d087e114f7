package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-management operators for training-data pipelines: test-set
  * decontamination, deterministic split assignment, per-slice term
  * statistics, and sequence packing.
  *
  * Shared design rules with the rest of `graft.llm`: determinism from
  * md5/integer arithmetic (no RNG, no engine-ordered float sums), the
  * big (corpus) side never shuffles more than once per operator, and
  * the small side (eval set, split table, centroids) broadcasts.
  */
object CorpusOps {

  /** Distinct word n-grams over a precomputed `__words` column; a doc
    * shorter than `n` words contributes its whole text as one gram
    * (same degenerate-doc rule as [[Dedup]]'s shingles). */
  private def gramExpr(n: Int): String =
    s"""array_distinct(CASE WHEN size(__words) < $n THEN array(text)
       |ELSE transform(sequence(1, size(__words) - ${n - 1}),
       |       i -> array_join(slice(__words, i, $n), ' '))
       |END)""".stripMargin

  private def docGrams(docs: DataFrame, n: Int): DataFrame =
    docs.withColumn("__words", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(gramExpr(n))).as("g"))

  /** Test-set decontamination (the GPT-3/PaLM n-gram overlap rule):
    * for every training doc, count its distinct word `n`-grams that
    * appear anywhere in `evalDocs`, and flag any doc with a hit as
    * contaminated — those docs leak benchmark answers into training
    * and must be dropped before the eval is meaningful.
    *
    * Shape at 100 TB: eval benchmarks are metadata-scale next to the
    * corpus, so their distinct-gram set BROADCASTS; the corpus side is
    * one narrow explode + a broadcast-hash semi-join + ONE partial-
    * aggregable groupBy(doc_id). The corpus never self-joins and never
    * shuffles its text — only (doc_id, matched-gram count) rows move. */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, n: Int = 5): DataFrame = {
    val evalGrams = docGrams(evalDocs, n).select(col("g")).distinct()
    val hits = docGrams(docs, n)
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("hits"))
    docs.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("hits"), lit(0L)).as("n_shared_ngrams"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Deterministic train/val/test assignment: bucket = the first 24
    * md5 bits of the doc id mod 100, so the split is a pure function
    * of the id — stable across runs, engines, partitionings, and
    * corpus growth (a doc keeps its split when new data arrives, the
    * property random sampling lacks). Narrow map, zero shuffles. */
  def hashSplit(docs: DataFrame, trainPct: Int = 96, valPct: Int = 2): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"percentages must partition 0-99: train=$trainPct val=$valPct")
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("bigint") % 100
    docs.select(col("doc_id"), bucket.as("bucket"),
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** Top-`k` characteristic terms per source slice, scored by
    * tf * (n_sources / df) — a TF-IDF variant with a rational idf
    * (integer ratio instead of a log: same ranking for fixed
    * n_sources, and exactly reproducible across engines, where libm
    * log differs in final ulps). Ties break lexicographically.
    *
    * Shape: corpus explode feeds ONE partial-aggregable (source, term)
    * count; everything downstream (document frequency, the per-source
    * top-k window) runs on vocabulary-scale rows, not corpus-scale —
    * at 100 TB the vocab table is millions of rows, the sort-per-slice
    * is bounded by it, and the corpus text itself never shuffles. */
  def topTerms(docs: DataFrame, k: Int = 10): DataFrame = {
    val tf = docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val ns = docs.agg(countDistinct(col("source")).as("ns"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(ns))
      .withColumn("score", (col("tf") * col("ns")).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("term"), col("tf"), col("df"),
        col("score"))
  }

  /** Sequence packing: lay documents head-to-tail into fixed
    * `capacity`-token context windows, contiguously in doc_id order
    * within each (lang, shard) stream — the standard pre-tokenization
    * layout step (docs spanning a boundary continue in the next bin,
    * i.e. pack-with-splitting). Emits each doc's bin and starting
    * offset; integer arithmetic end to end.
    *
    * Shape: ONE shuffle (the per-stream ordering window). `shards`
    * bounds the window partition width — packing partitions by
    * (lang, doc_id % shards), not by lang alone, because a window
    * partition is processed by one task: at corpus scale "all English
    * docs" in one sort is the classic window skew; hash shards keep
    * every stream task-sized while preserving determinism. */
  def packSequences(docs: DataFrame, capacity: Int = 512,
                    shards: Int = 8): DataFrame = {
    require(capacity > 0 && shards > 0, "capacity and shards must be positive")
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        (col("doc_id") % shards).as("shard"),
        size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("running", sum(col("n_tokens")).over(w))
      // "start_offset", not "offset": the gate oracle aliases the same
      // column and OFFSET is a SQL keyword
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        floor((col("running") - col("n_tokens")) / capacity).as("bin"),
        ((col("running") - col("n_tokens")) % capacity).as("start_offset"))
  }
}
