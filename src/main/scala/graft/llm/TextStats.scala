package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for training-data pipelines: quality
  * scoring, token counting, fingerprinting, language ID.
  *
  * All are single-pass, codegen-friendly column expressions (no UDFs) —
  * at 100 TB each is a narrow map over the corpus with at most one
  * shuffle for the aggregating variants. Determinism note: anything
  * hash-based uses md5 over explicit strings so results are
  * reproducible across engines and runs.
  */
object TextStats {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-document quality metrics: length, word stats, stopword ratio,
    * and a boolean quality gate — the standard pre-training corpus
    * filters (length bounds, stopword sanity). */
  def qualityMetrics(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val nWords = size(words)
    val stopHits = size(filter(words, w => w.isin(stopwords: _*)))
    docs.select(
      col("doc_id"), col("lang"), col("n_chars"),
      nWords.as("n_words"),
      (length(col("text")) - nWords + 1).cast("double")./(nWords).as("avg_word_len"),
      stopHits.cast("double")./(nWords).as("stopword_ratio"),
      (nWords >= 20 && nWords <= 200 &&
        (stopHits.cast("double") / nWords) < lit(0.5)).as("passes_quality"))
  }

  /** Token counts: whitespace tokens plus a BPE-ish regex token count
    * (letter runs / digit runs / single non-alphanumeric). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      expr("""size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))""")
        .as("regex_tokens"),
      length(col("text")).as("n_bytes"))

  /** Content-defined fingerprints: all char 8-gram shingles hashed,
    * keep the 1/16 sample where md5 starts with '0' (winnowing-style
    * selection) — a compact sketch for containment/overlap checks. */
  def fingerprints(docs: DataFrame): DataFrame = {
    docs
      .withColumn("fps", expr(
        """CASE WHEN length(text) < 8 THEN array()
          |ELSE filter(transform(sequence(1, length(text) - 7),
          |            i -> md5(substr(text, i, 8))), h -> substr(h, 1, 1) = '0')
          |END""".stripMargin))
      .select(
        col("doc_id"),
        size(col("fps")).as("n_fingerprints"),
        array_min(col("fps")).as("min_fingerprint"),
        array_max(col("fps")).as("max_fingerprint"))
  }

  /** Language ID by corpus profile: build each language's top-10 word
    * profile from labeled data, classify each doc to the profile with
    * the largest distinct-word overlap (ties -> lexicographic lang).
    * Two shuffles: profile build (tiny) and the doc-word explode join —
    * the profile side broadcasts. */
  def langId(docs: DataFrame): DataFrame = {
    val docWords = docs.select(col("doc_id"), col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("word"))
    val profile = docWords
      .groupBy(col("lang").as("profile_lang"), col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("profile_lang"))
          .orderBy(col("freq").desc, col("word"))))
      .filter(col("rk") <= 10)
      .select(col("profile_lang"), col("word"))
    val overlaps = docWords
      .join(broadcast(profile), Seq("word"))
      .groupBy(col("doc_id"), col("lang"), col("profile_lang"))
      .agg(count(lit(1)).as("overlap"))
    val best = Window.partitionBy(col("doc_id"))
      .orderBy(col("overlap").desc, col("profile_lang"))
    overlaps
      .withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("lang"),
              col("profile_lang").as("predicted_lang"),
              col("overlap"),
              (col("lang") === col("profile_lang")).as("correct"))
  }
}
