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

  /** C4/Gopher-style heuristic corpus filter: the published
    * pre-training cleaning rules (C4: Raffel et al. 2020 §2.2; Gopher:
    * Rae et al. 2021 appendix A1.1), reduced to what a single-line doc
    * supports — word-count bounds, mean-word-length bounds, alpha-word
    * ratio, stopword evidence, distinct-word (repetition) ratio,
    * terminal punctuation. Each rule surfaces as its OWN flag so a
    * pipeline can ablate/tune thresholds without re-reading the corpus;
    * `keep` is their conjunction. One narrow codegen'd pass, no
    * shuffle, no UDF — at 100 TB this is scan-bound. */
  def heuristicFilter(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val n = size(words)
    val meanLen = (length(col("text")) - n + 1).cast("double") / n
    val alphaRatio =
      size(filter(words, w => w.rlike("[a-z]"))).cast("double") / n
    val stopHits = size(filter(words, w => w.isin(stopwords: _*)))
    val distinctRatio = size(array_distinct(words)).cast("double") / n
    docs.select(
      col("doc_id"),
      n.as("n_words"),
      (n >= 5 && n <= 10000).as("word_count_ok"),
      (meanLen >= 2.0 && meanLen <= 12.0).as("mean_word_len_ok"),
      (alphaRatio >= 0.8).as("alpha_ratio_ok"),
      (stopHits >= 1).as("stopword_ok"),
      (distinctRatio >= 0.3).as("repetition_ok"),
      // last-char test, NOT a regex '$' anchor: Java's '$' matches
      // before a trailing newline while RE2's (the oracle's) does not —
      // right(text, 1) has one semantics in both engines
      expr("right(text, 1)").isin(".", "!", "?").as("terminal_punct_ok"))
      .withColumn("keep",
        col("word_count_ok") && col("mean_word_len_ok") &&
          col("alpha_ratio_ok") && col("stopword_ok") &&
          col("repetition_ok") && col("terminal_punct_ok"))
  }

  /** Max multiplicity of any element in a sorted string array: one
    * fold carrying (prev, run, best) — the mode count without a
    * group-by. */
  private def maxRunExpr(sortedArr: String): String =
    s"""aggregate($sortedArr,
       |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
       |  (acc, x) -> named_struct(
       |    'prev', x,
       |    'run', IF(x <=> acc.prev, acc.run + 1L, 1L),
       |    'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1L, 1L))),
       |  acc -> acc.best)""".stripMargin

  /** Gopher-style repetition metrics (Rae et al. 2021 A1.1): the
    * fraction of the document taken by its most frequent word and by
    * its most frequent word bigram — the standard screens for looping /
    * boilerplate text.
    *
    * Shape: a NARROW per-row map — each gram multiset is sorted in
    * place and its max run length (= the mode's count) read off with
    * one fold. The previous two explode + (doc_id, gram) group-by
    * aggregations shuffled every corpus position twice; per-doc
    * O(n log n) sorting with ZERO shuffles is strictly better at any
    * scale (measured 2.1 s -> narrow-map cost at sf0.1) and keeps the
    * operator in the shuffle-free plan-guard set. A doc too short for
    * bigrams scores 0.0. */
  def repetitionMetrics(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("mc", expr(maxRunExpr("array_sort(w)")))
      .withColumn("mc2", expr(maxRunExpr(
        """array_sort(transform(slice(w, 1, greatest(size(w) - 1, 0)),
          |  (x, i) -> concat(x, ' ', element_at(w, i + 2))))""".stripMargin)))
      .select(col("doc_id"), size(col("w")).as("n_words"),
        (col("mc").cast("double") / size(col("w"))).as("frac_top_word"),
        when(size(col("w")) > 1,
          col("mc2").cast("double") / (size(col("w")) - 1))
          .otherwise(lit(0.0)).as("frac_top_bigram"))

  /** PII patterns, deliberately RE2-compatible (no lookaround, no
    * backrefs, ASCII word boundaries) so the SAME pattern text means
    * the same thing under Java regex (Spark) and RE2 (the DuckDB
    * oracle). Order of application is part of the contract: emails
    * first (their host part contains dotted tokens an IP pattern could
    * claim), then IPv4, then international phone numbers. */
  private[llm] val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+\\d{7,15}", "<PHONE>"))

  /** PII redaction: emails, IPv4 addresses, and +international phone
    * numbers replaced with typed placeholders — the standard
    * pre-training scrub pass. Per-category match counts surface so a
    * pipeline can monitor redaction rates; the redacted text's md5
    * pins byte-exact replacement behavior cross-engine. One narrow
    * codegen'd pass, no UDF, no shuffle. */
  def redactPii(docs: DataFrame): DataFrame = {
    val counted = PiiPatterns.foldLeft(docs.withColumn("redacted", col("text"))) {
      case (df, (name, pat, repl)) =>
        // count on the PRE-replacement text of this stage (the running
        // `redacted` column), so earlier placeholders can't be re-counted
        // typed-Column regex args: an expr() string would SQL-unescape
        // the pattern's backslashes
        df.withColumn(s"n_$name",
          size(regexp_extract_all(col("redacted"), lit(pat), lit(0))))
          .withColumn("redacted", regexp_replace(col("redacted"), pat, repl))
    }
    counted.select(col("doc_id") +:
      PiiPatterns.map { case (name, _, _) => col(s"n_$name") } :+
      md5(col("redacted")).as("redacted_md5"): _*)
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

  /** Powers of 31 mod 2^31-1 for the 8-char polynomial hash — shared
    * with the DuckDB oracle so both engines unroll the same terms. */
  private[llm] val Pow31: Seq[Long] = {
    val p = 2147483647L
    Iterator.iterate(1L)(x => x * 31 % p).take(8).toSeq
  }

  /** The unrolled polynomial over a precomputed code-point array `cps`:
    * sum_k cps[i+k] * 31^k mod 2^31-1 — integer ops with O(1) array
    * indexing. The code points MUST be materialized once per doc first:
    * per-position `substr(text, i, 1)` seeks from the string start in
    * UTF8-aware engines, turning the scan quadratic per document. */
  private[llm] def polyHash(elemFn: (Int) => String): String =
    (0 until 8).map(k =>
      s"CAST(${elemFn(k)} AS BIGINT) * ${Pow31(k)}")
      .mkString("(", " + ", ") % 2147483647")

  /** Content-defined fingerprints: every char 8-gram hashed with a
    * polynomial over its code points (a digest per position made this
    * the 2nd-slowest operator in the suite), keep the 1/16 sample where
    * hash % 16 == 0 (winnowing-style selection) — a compact sketch for
    * containment/overlap checks.
    *
    * Runs on the native codegen'd
    * [[graft.functions.WinnowFingerprints]] expression: the previous
    * higher-order-function formulation (kept as [[fingerprintsHof]]
    * and pinned bit-identical by `WinnowFingerprintsSpec`) evaluated a
    * boxed lambda per window position — CodegenFallback, the dominant
    * cost of this operator at any scale. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs
      .withColumn("fps", graft.functions.Native.winnowFingerprints(col("text")))
      .select(
        col("doc_id"),
        size(col("fps")).as("n_fingerprints"),
        array_min(col("fps")).as("min_fingerprint"),
        array_max(col("fps")).as("max_fingerprint"))

  /** Reference higher-order-function formulation of [[fingerprints]] —
    * the cross-engine-portable SQL shape (mirrors the DuckDB oracle
    * text). Retained as the parity witness for the native expression. */
  private[graft] def fingerprintsHof(docs: DataFrame): DataFrame = {
    val h = polyHash(k => s"element_at(cps, i + $k)")
    docs
      // one O(n) pass builds the code points; everything after is O(1)
      .withColumn("cps", expr("transform(split(text, ''), c -> ascii(c))"))
      .withColumn("fps", expr(
        s"""CASE WHEN size(cps) < 8 THEN array()
           |ELSE filter(transform(sequence(1, size(cps) - 7),
           |            i -> $h), x -> x % 16 = 0)
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
