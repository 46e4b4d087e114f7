package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full byte-pair-encoding vocabulary training + tokenization
  * (Sennrich et al. 2016), distributed the way production BPE
  * trainers actually run: the corpus collapses ONCE to a
  * word-frequency table (vocabulary-sized — the only corpus-scale
  * shuffle in the whole procedure), every merge round counts adjacent
  * symbol pairs over that table weighted by word frequency, and the
  * driver only ever sees each round's single winning pair (a 1-row
  * `TakeOrderedAndProject`). [[CorpusOps.bpePairCounts]] (q125) is
  * the oracle-checked primitive of one such round at character
  * granularity; this iterates it to a vocabulary.
  *
  * Determinism: ties in pair counts break lexicographically, greedy
  * merge application scans strictly left-to-right (so `aaa` under an
  * `(a,a)` merge becomes `[aa, a]`, matching the reference
  * implementation), and the whole procedure is a pure function of
  * the corpus — any partitioning trains the identical vocabulary.
  *
  * Scale notes: each round's pair count partial-aggregates map-side
  * over the word table; the symbol-merge rewrite is a narrow
  * per-row higher-order function; `localCheckpoint` between rounds
  * keeps the plan from accreting one projection per merge. Nothing
  * per-document survives past the first aggregation.
  */
object BpeTrainer {

  /** A trained model: ordered merge rules plus the final word
    * segmentations (`w`, `freq`, `syms`). */
  final case class BpeModel(merges: Seq[(String, String)], words: DataFrame)

  /** Character segmentation of a word — the seed step of training AND
    * the OOV fallback of [[encode]], shared so the two can never
    * drift. `length(w) >= 1` is load-bearing: Spark's `sequence(1, 0)`
    * counts DOWN (default step -1), so an unguarded empty string would
    * fabricate two empty-string tokens; callers must filter empty
    * words first (consecutive spaces in `split` output produce them). */
  private val charSymsExpr: String =
    "transform(sequence(1, length(w)), i -> substring(w, i, 1))"

  /** Greedy left-to-right single-pair merge over a symbol array, as a
    * Catalyst higher-order-function expression: fold the array with a
    * (done, pending) accumulator, gluing `pending == a && x == b`
    * pairs into one symbol. Codegen-friendly — no UDF. */
  private[llm] def mergePairExpr(a: String, b: String): String = {
    // symbols come from the corpus; escape quotes for the SQL literals
    def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    s"""aggregate(
       |  syms,
       |  named_struct('acc', CAST(array() AS ARRAY<STRING>),
       |    'pend', CAST(NULL AS STRING)),
       |  (st, x) -> CASE
       |    WHEN st.pend IS NULL
       |      THEN named_struct('acc', st.acc, 'pend', x)
       |    WHEN st.pend = '${q(a)}' AND x = '${q(b)}'
       |      THEN named_struct('acc',
       |        concat(st.acc, array('${q(a + b)}')),
       |        'pend', CAST(NULL AS STRING))
       |    ELSE named_struct('acc', concat(st.acc, array(st.pend)),
       |      'pend', x) END,
       |  st -> CASE WHEN st.pend IS NULL THEN st.acc
       |    ELSE concat(st.acc, array(st.pend)) END)""".stripMargin
  }

  /** Train `nMerges` rounds on the space-tokenized corpus. Stops
    * early when no pair occurs at least `minCount` times. */
  def train(docs: DataFrame, nMerges: Int, minCount: Long = 2L): BpeModel = {
    require(nMerges >= 1 && minCount >= 1)
    var words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), expr(charSymsExpr).as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS a,
            |              element_at(syms, i + 1) AS b))""".stripMargin))
          .as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minCount) done = true
      else {
        val a = top(0).getAs[String]("a")
        val b = top(0).getAs[String]("b")
        merges += ((a, b))
        words = words
          .withColumn("syms", expr(mergePairExpr(a, b)))
          .localCheckpoint()
        round += 1
      }
    }
    BpeModel(merges.result(), words)
  }

  /** Tokenize documents with a trained model: every word joins its
    * final segmentation (the word table is the model — vocabulary-
    * sized, so the join broadcasts at any corpus scale); words never
    * seen in training fall back to characters. Returns one row per
    * doc with its BPE token array and count — EVERY doc, including
    * all-whitespace ones (empty token array), per-doc accountability
    * like the dedup ladder. */
  def encode(docs: DataFrame, model: BpeModel): DataFrame = {
    val seg = model.words.select(col("w"), col("syms"))
    val encoded = docs
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("wpos", "w")))
      // empty words (consecutive/leading/trailing spaces) carry no
      // tokens — and would trip charSymsExpr's sequence guard
      .filter(length(col("w")) >= 1)
      .join(broadcast(seg), Seq("w"), "left")
      .select(col("doc_id"), col("wpos"),
        coalesce(col("syms"), expr(charSymsExpr)).as("toks"))
      .groupBy(col("doc_id"))
      // per-group state is one document's words — doc-bounded, the
      // same envelope as reading the document itself
      .agg(array_sort(collect_list(struct(col("wpos"), col("toks"))))
        .as("ordered"))
      .select(col("doc_id"),
        flatten(transform(col("ordered"), e => e.getField("toks")))
          .as("tokens"))
    docs.select(col("doc_id"))
      .join(encoded, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("tokens"), expr("CAST(array() AS ARRAY<STRING>)"))
          .as("tokens"))
      .select(col("doc_id"), col("tokens"),
        size(col("tokens")).cast("bigint").as("n_tokens"))
  }
}
