package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-based word n-gram language modeling over a document corpus —
  * the classic data-side LM toolkit (train counts, score held-out
  * text, mine collocations) expressed as pure relational plans.
  *
  * The reference pipeline has no LM tier; this extends the corpus
  * operator family (driver contract: large-scale training-data ops)
  * with the two primitives a data-quality stack actually runs:
  * perplexity-style scoring of candidate documents against a corpus
  * model (CCNet-style quality bucketing, Wenzek et al. 2020) and
  * PMI collocation mining (Church & Hanks 1990).
  *
  * Determinism contract — NO transcendentals anywhere: a log-space
  * perplexity would hinge on `ln()` agreeing to the last ulp across
  * engines (libm vs fdlibm — not guaranteed, unlike the IEEE basic
  * ops and sqrt, which are correctly rounded everywhere). So
  *   - [[scoreHeldOut]] ranks by the MEAN Laplace probability, each
  *     per-bigram probability materialized as the exact integer
  *     `(1e9·(c_ab+1)) div (c_a+V)` — BIGINT floor division both
  *     engines compute identically; the one double division per doc
  *     sees identical operands everywhere;
  *   - [[pmiCollocations]] ranks by the PMI *ratio*
  *     `N·c(a,b) / (c(a,·)·c(·,b))` — `log` is monotone, so the
  *     ranking is exactly PMI's, without ever taking the log; the
  *     surfaced score is one IEEE division of exactly-computed
  *     doubles.
  *
  * Scale shape: everything reduces to bigram/unigram count tables
  * (vocabulary-sized, partial-aggregated map-side) and co-partitioned
  * equi-joins on those keys; the only broadcast is a 1-row scalar.
  * Nothing here holds per-document state or collects to the driver.
  */
object NgramLm {

  /** Adjacent word pairs per document, skipping single-word docs —
    * a narrow plan (split + transform + explode, no shuffle). The
    * `size >= 2` guard runs BEFORE `sequence(1, size-1)`: Spark's
    * `Sequence` with start > stop counts DOWN (default step -1), so
    * an unguarded one-word doc would fabricate pairs. */
  private[llm] def bigrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(w) - 1),
          |  i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))"""
          .stripMargin)).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))

  /** Train a Laplace-smoothed bigram model on the `docId % holdMod
    * != holdRem` slice and score every held-out document against it.
    *
    * Per held-out bigram instance: `p_scaled = (1e9·(c_ab+1)) div
    * (c_a+V)` — Laplace `P(b|a) = (c(a,b)+1)/(c(a,·)+V)` in exact
    * BIGINT parts-per-1e9 (V = train vocabulary size). Output per
    * doc: instance count, count of bigrams never seen in training,
    * and the mean scaled probability (higher = more corpus-typical;
    * the CCNet bucketing signal, minus the un-portable `ln`).
    *
    * Plan: count tables shuffle on their own keys (bigram / left
    * word — vocabulary-sized with map-side combine), held-out
    * instances join them co-partitioned on those keys, the scalar V
    * rides a broadcast; final aggregate shuffles on doc_id. */
  def scoreHeldOut(docs: DataFrame, holdMod: Int = 10, holdRem: Int = 0,
                   materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(holdMod >= 2, s"holdMod must split the corpus, got $holdMod")
    val bg = bigrams(docs)
    val isHeld = col("doc_id") % holdMod === holdRem
    val train = bg.filter(!isHeld)
    // c(a,·) and V are both derived from the count table, so the
    // corpus-scale explode runs for exactly TWO consumers: the train
    // counts and the held-out instances. `materialize` is the scale
    // hook (q54's discipline — pass `_.localCheckpoint()`): AQE does
    // NOT stage-reuse the (a,b) exchange here (the higher-order-
    // function lambdas in [[bigrams]] defeat canonicalized matching —
    // measured, 4 separate ShuffleQueryStages without it), and the
    // count table is vocabulary-sized, the cheapest thing to pin.
    val cAb = materialize(train.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c_ab")))
    val cA = cAb.groupBy(col("a")).agg(sum(col("c_ab")).as("c_a"))
    // V = distinct words participating in training bigrams (the
    // model's event space — a word seen only in one-word docs never
    // conditions or follows anything, so it carries no mass anyway)
    val vocab = cAb.select(col("a").as("w"))
      .union(cAb.select(col("b").as("w")))
      .agg(countDistinct(col("w")).as("vocab"))
    bg.filter(isHeld)
      .join(cAb, Seq("a", "b"), "left")
      .join(cA, Seq("a"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        coalesce(col("c_ab"), lit(0L)).as("c_ab"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        col("vocab"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c_ab") === 0L, 1L).otherwise(0L)).as("unseen_bigrams"),
        sum(expr("(1000000000L * (c_ab + 1)) DIV (c_a + vocab)"))
          .as("p_scaled_sum"))
      .select(col("doc_id"), col("n_bigrams"), col("unseen_bigrams"),
        (col("p_scaled_sum").cast("double") /
          col("n_bigrams").cast("double")).as("mean_scaled_p"))
      .orderBy(col("doc_id"))
  }

  /** Oracle twin of [[scoreHeldOut]] (DuckDB dialect). */
  def scoreHeldOutSql(holdMod: Int = 10, holdRem: Int = 0): String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |flat AS (
      |  SELECT doc_id, s.a AS a, s.b AS b FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
      |      i -> struct_pack(a := w[i], b := w[i + 1]))) AS s
      |    FROM toks WHERE len(w) >= 2)),
      |cab AS (SELECT a, b, COUNT(*) AS c_ab FROM flat
      |  WHERE doc_id % $holdMod <> $holdRem GROUP BY a, b),
      |ca AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a
      |  FROM cab GROUP BY a),
      |voc AS (SELECT COUNT(DISTINCT u) AS vocab FROM
      |  (SELECT a AS u FROM cab UNION SELECT b FROM cab)),
      |held AS (
      |  SELECT f.doc_id, COALESCE(c_ab, 0) AS c_ab, COALESCE(c_a, 0) AS c_a
      |  FROM flat f LEFT JOIN cab USING (a, b) LEFT JOIN ca USING (a)
      |  WHERE f.doc_id % $holdMod = $holdRem)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(CASE WHEN c_ab = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS unseen_bigrams,
      |  CAST(CAST(SUM((1000000000 * (c_ab + 1)) // (c_a + vocab)) AS BIGINT)
      |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_scaled_p
      |FROM held, voc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Top collocations by pointwise mutual information: the
    * `minCount`-supported bigrams ranked by `N·c(a,b) /
    * (c(a,·)·c(·,b))` — monotone-equivalent to PMI, so the order IS
    * the PMI order. All counts come from ONE bigram-instance table
    * (c(a,·)/c(·,b) are its margins), multiplied in exact BIGINTs and
    * divided once into the surfaced double. Ties (same ratio) break
    * lexicographically.
    *
    * Plan: margins are vocabulary-sized partial aggregates; the
    * bigram table joins each margin co-partitioned on one word; the
    * 1-row N broadcasts; top-N is TakeOrderedAndProject — per-
    * partition heaps, never a global sort. Counts are cast to DOUBLE
    * before multiplying, so the score never overflows at any corpus
    * size (both engines do the identical IEEE multiply/divide). */
  def pmiCollocations(docs: DataFrame, minCount: Int = 5, topN: Int = 30,
                      materialize: DataFrame => DataFrame = identity): DataFrame = {
    val bg = bigrams(docs)
    // margins and N all fold the vocabulary-sized count table; AQE
    // does not stage-reuse the (a,b) exchange across the four
    // consumers (lambda canonicalization — see [[scoreHeldOut]]), so
    // `materialize = _.localCheckpoint()` pins the count table and
    // the corpus-scale explode runs ONCE
    val cAb = materialize(
      bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab")))
    val cA = cAb.groupBy(col("a")).agg(sum(col("c_ab")).as("c_a"))
    val cB = cAb.groupBy(col("b")).agg(sum(col("c_ab")).as("c_b"))
    val n = cAb.agg(sum(col("c_ab")).as("n_bigrams"))
    cAb.filter(col("c_ab") >= minCount)
      .join(cA, Seq("a"))
      .join(cB, Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        (col("n_bigrams").cast("double") * col("c_ab").cast("double") /
          (col("c_a").cast("double") * col("c_b").cast("double")))
          .as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("a"), col("b"))
      .limit(topN)
  }

  /** Oracle twin of [[pmiCollocations]] (DuckDB dialect). */
  def pmiCollocationsSql(minCount: Int = 5, topN: Int = 30): String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |flat AS (
      |  SELECT s.a AS a, s.b AS b FROM (
      |    SELECT unnest(list_transform(generate_series(1, len(w) - 1),
      |      i -> struct_pack(a := w[i], b := w[i + 1]))) AS s
      |    FROM toks WHERE len(w) >= 2)),
      |cab AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
      |  FROM flat GROUP BY a, b),
      |ca AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY a),
      |cb AS (SELECT b, CAST(SUM(c_ab) AS BIGINT) AS c_b FROM cab GROUP BY b),
      |n AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_bigrams FROM cab)
      |SELECT a, b, c_ab, c_a, c_b,
      |  CAST(n_bigrams AS DOUBLE) * CAST(c_ab AS DOUBLE) /
      |    (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)) AS pmi_ratio
      |FROM cab JOIN ca USING (a) JOIN cb USING (b), n
      |WHERE c_ab >= $minCount
      |ORDER BY pmi_ratio DESC, a, b LIMIT $topN""".stripMargin
}
