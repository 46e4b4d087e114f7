package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 corpus-curation operators: the steps between "scored
  * documents" and "training mixture" that large-scale LLM data
  * pipelines run after the classic filter/dedup ladder
  * ([[CorpusOps]], [[Dedup]]) — chunk-level exact dedup (Dolma),
  * per-source boilerplate discovery, semantic dedup over embeddings
  * (SemDeDup, Abbas et al. 2023), hashed-feature importance weighting
  * (DSIR-style, Xie et al. 2023), duplicate-cluster representative
  * election, curriculum ordering, and held-out n-gram novelty.
  *
  * House determinism discipline (see [[NgramLm]]): no transcendentals
  * anywhere — every cross-engine-surfaced number is either exact
  * integer/decimal arithmetic, a single IEEE division of exactly
  * computed operands, or a 6-dp-rounded cosine whose fold order is
  * pinned ([[Similarity.dot]]).
  */
object CurationOps {

  private def words: Column = split(col("text"), " ")

  // ------------------------------------------------------------ chunks
  /** Chunk-level exact deduplication (the Dolma/C4 paragraph-dedup
    * rule, applied to fixed `w`-word chunks because the corpus has no
    * paragraph marks): split every document into consecutive `w`-word
    * chunks, drop each chunk whose text also occurs in ANY other
    * document, and surface the md5 of the reassembled kept text as
    * the correctness witness.
    *
    * Shape at 100 TB: the chunk table is |corpus tokens|/w rows and
    * never self-joins — the duplicate flag is ONE partial-aggregable
    * groupBy on the chunk's md5 (constant-width shuffle key, never
    * the chunk text), the flag joins back co-partitioned on that same
    * key, and reassembly is one groupBy(doc_id). Map-side combine
    * does the heavy lifting on both shuffles; nothing quadratic,
    * nothing driver-side. */
  def chunkDedup(docs: DataFrame, w: Int = 16): DataFrame = {
    require(w >= 1, s"chunk width must be positive, got $w")
    val chunks = expr(
      s"""transform(sequence(1, greatest(size(split(text, ' ')), 1), $w),
         |  i -> array_join(slice(split(text, ' '), i, $w), ' '))""".stripMargin)
    val ex = docs
      .select(col("doc_id"), posexplode(chunks).as(Seq("pos", "chunk")))
      .withColumn("ch", md5(col("chunk")))
    val shared = ex.groupBy(col("ch"))
      .agg((min(col("doc_id")) =!= max(col("doc_id"))).as("shared"))
    ex.join(shared, Seq("ch"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("shared"), 1L).otherwise(0L)).as("n_dropped"),
        md5(array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN NOT shared THEN " +
            "struct(pos, chunk) END)), x -> x.chunk)"), " ")).as("clean_md5"))
  }

  // ------------------------------------------------------- boilerplate
  /** Per-source boilerplate discovery: the most common leading
    * `k`-word prefix of each source's documents and the exact share
    * of documents opening with it. Web-crawl sources whose pages
    * share a navigation header show up with `share` near 1 — the
    * C4-style "remove the boilerplate line every page starts with"
    * signal, computed corpus-wide instead of per-page.
    *
    * Shape: one partial-aggregable groupBy(source, prefix) — the
    * prefix is ≤ k words, not the document — then a window over the
    * per-source *distinct-prefix* rows (metadata-scale next to the
    * corpus). The share is one IEEE division of two exact counts. */
  def sourceBoilerplate(docs: DataFrame, k: Int = 8,
                        flagShare: Double = 0.02): DataFrame = {
    val byPrefix = docs
      .select(col("source"),
        array_join(slice(words, 1, k), " ").as("prefix"))
      .groupBy(col("source"), col("prefix"))
      .agg(count(lit(1)).as("n_prefix"))
    val wTop = Window.partitionBy(col("source"))
      .orderBy(col("n_prefix").desc, col("prefix"))
    val wAll = Window.partitionBy(col("source"))
    byPrefix
      .withColumn("n_docs", sum(col("n_prefix")).over(wAll))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("source"), col("n_docs"),
        col("prefix").as("top_prefix"), col("n_prefix"),
        (col("n_prefix").cast("double") / col("n_docs")).as("share"),
        (col("n_prefix").cast("double") / col("n_docs") >= flagShare)
          .as("boilerplate"))
  }

  // ---------------------------------------------------------- semdedup
  /** SemDeDup (Abbas et al. 2023): cluster embeddings with the
    * deterministic IVF coarse quantizer ([[Similarity.ivfAssign]] —
    * every `centStride`-th vector is a centroid, broadcast to every
    * partition), then inside each cluster drop every vector that has
    * a LOWER-id neighbor at cosine ≥ `tau`. Keeping the minimum id
    * makes the survivor set a pure function of the data — no
    * iteration order, no RNG.
    *
    * Shape at 100 TB: the quadratic is confined to single clusters —
    * the self-join equi-keys on cent_id, so each task sees one
    * cluster's members, and the cluster-size cap is the quantizer's
    * cell granularity (more centroids = smaller cells = cheaper
    * verify, the SemDeDup paper's own knob). The pair stream never
    * leaves the join task: it collapses to a `dropped` flag via
    * distinct-on-vec_id before touching the output. Both join sides
    * are the same aliased plan, so the assignment computes once and
    * the second side reads the ReusedExchange. */
  def semDedup(embeddings: DataFrame, tau: Double = 0.35,
               centStride: Long = 100): DataFrame = {
    val assigned = Similarity.ivfAssign(embeddings, centStride)
      .withColumn("nv", Similarity.norm(col("embedding")))
      .select(col("cent_id"), col("vec_id"), col("embedding"), col("nv"))
      .hint("merge")
    val dropped = assigned.alias("l").join(assigned.alias("r"), Seq("cent_id"))
      .filter(col("l.vec_id") < col("r.vec_id"))
      .filter(round(Similarity.cosineWithNorms(
        col("l.embedding"), col("r.embedding"),
        col("l.nv"), col("r.nv")), 6) >= tau)
      .select(col("r.vec_id").as("vec_id")).distinct()
      .withColumn("is_dropped", lit(true))
    assigned.select(col("vec_id"), col("cent_id"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"),
        coalesce(col("is_dropped"), lit(false)).as("dropped"))
  }

  // ------------------------------------------------------------- dsir
  /** DSIR-style importance weighting (Xie et al. 2023) over hashed
    * bigram features, in the house no-transcendental form: each
    * bigram hashes to one of `buckets` features (md5-prefix mod — the
    * same portable hash as [[CorpusOps.hashSplit]]); the target slice
    * (here: documents whose `lang` is `targetLang`) and the full
    * corpus each get Laplace-smoothed per-bucket probabilities as
    * exact BIGINT parts-per-1e9; a document's score is
    * Σ_b c_doc[b] · (p_target[b] − p_corpus[b]) — the linear
    * classifier margin in probability space (DSIR's log-ratio
    * replaced by the probability difference so every intermediate
    * stays exact integer; `ln` is not correctly-rounded-portable,
    * see [[NgramLm]]).
    *
    * Overflow audit: p ≤ 1e9, so a doc's score magnitude is ≤ 1e9 ·
    * its bigram count — a 10M-token document stays under 2^63 with
    * five orders of magnitude to spare.
    *
    * Shape at 100 TB: both bucket count tables come out of ONE
    * conditional-sum groupBy over the bigram stream (`buckets` rows,
    * partial aggregated map-side, broadcast back); the corpus side is
    * one narrow bigram explode (pinned by `materialize` so the count
    * pass and the scoring join don't each re-explode the corpus — the
    * q54 hook discipline) + a broadcast join + one groupBy(doc_id).
    * No shuffle ever carries text. */
  def dsirWeights(docs: DataFrame, targetLang: String = "en",
                  buckets: Int = 64,
                  materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(buckets >= 2, s"need at least 2 feature buckets, got $buckets")
    val bg = docs
      .select(col("doc_id"), col("lang"), words.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        """transform(sequence(1, size(w) - 1),
          |  i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"""
          .stripMargin)).as("bigram"))
    val bucketed = materialize(bg.select(col("doc_id"), col("lang"),
      (conv(substring(md5(col("bigram")), 1, 6), 16, 10).cast("long")
        % buckets).as("bucket")))
    val counts = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_r"),
        sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("c_t"))
    // Laplace-smoothed scaled probabilities over the FULL bucket
    // domain (sequence 0..buckets-1): a bucket no target bigram hit
    // still carries probability 1/(N_t+B), exactly like DSIR's
    // smoothed estimate.
    val domain = docs.sparkSession.range(buckets).select(col("id").as("bucket"))
    val probs = domain
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("c_r"), lit(0L)).as("c_r"),
        coalesce(col("c_t"), lit(0L)).as("c_t"))
    val totals = probs.agg(sum(col("c_r")).as("n_r"), sum(col("c_t")).as("n_t"))
    val scaled = probs.crossJoin(broadcast(totals))
      .select(col("bucket"),
        expr(s"(1000000000L * (c_t + 1)) div (n_t + $buckets)").as("p_t"),
        expr(s"(1000000000L * (c_r + 1)) div (n_r + $buckets)").as("p_r"))
    bucketed
      .join(broadcast(scaled), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_t") - col("p_r")).as("score_scaled"))
  }

  // ------------------------------------------- cluster representatives
  /** Duplicate-cluster representative election: given near-dup
    * cluster labels (q61's connected components) and per-document
    * quality scores (q68), keep the highest-quality member of every
    * cluster (ties to the lowest doc_id) — the step that turns "these
    * documents are copies" into "train on THIS one".
    *
    * Shape: one partial-aggregable `max_by` groupBy over the cluster
    * table, which is metadata-scale (only docs that appear in some
    * near-dup pair). No sorts, no windows. */
  def clusterRepresentatives(clusters: DataFrame, quality: DataFrame): DataFrame =
    clusters
      .join(quality, clusters("id") === quality("doc_id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"),
        max_by(col("doc_id"),
          struct(col("quality_score"), (-col("doc_id")).as("tie")))
          .as("rep_doc_id"),
        max(col("quality_score")).as("rep_score"))

  // -------------------------------------------------------- curriculum
  /** Curriculum ordering: decile documents by quality score (best
    * decile first) and round-robin sources inside each decile, so
    * training consumes high-quality data early without starving any
    * source. The surfaced (decile, rr, source) triple IS the sort
    * key — lexicographically ordering by it yields the curriculum —
    * so no global sequence number is ever materialized.
    *
    * Scale note: `ntile` here is the exact global decile; at 100 TB
    * the same operator runs with decile boundaries read from the
    * mergeable quantile histogram (q138's sketch) and assigned in a
    * narrow map — the round-robin window is already safe (partitioned
    * by decile × source). */
  def curriculumOrder(quality: DataFrame): DataFrame = {
    val wDecile = Window.orderBy(col("quality_score").desc, col("doc_id"))
    val wRr = Window.partitionBy(col("decile"), col("source"))
      .orderBy(col("doc_id"))
    quality
      .withColumn("decile", ntile(10).over(wDecile))
      .withColumn("rr", row_number().over(wRr))
      .select(col("doc_id"), col("source"), col("decile"), col("rr"))
  }

  // --------------------------------------------------------------- cdc
  /** Content-defined chunking (the rsync/LBFS boundary rule, word
    * granularity): a segment boundary opens at word `i` whenever the
    * rolling 4-word window starting there hashes to `0 mod divisor` —
    * so segment boundaries are decided by CONTENT, not position, and
    * an insertion near the start of a document shifts at most one
    * segment instead of re-chunking everything after it (the failure
    * mode of [[chunkDedup]]'s fixed windows). Downstream is the same
    * dedup rule: a segment drops when its text occurs in any other
    * document.
    *
    * Expected segment length is `divisor` words (geometric); divisor
    * 16 ≈ the fixed chunk width, so the two operators are directly
    * comparable on the same corpus.
    *
    * Shape at 100 TB: the token stream is one posexplode; boundary
    * detection is a `lead` window and segment ids a running sum —
    * both over the SAME (doc_id, pos) ordering, so Catalyst plans ONE
    * exchange + one sort for both window specs; segment assembly and
    * the dup flag are the [[chunkDedup]] groupBys (md5 keys, map-side
    * combine). Nothing quadratic, nothing driver-side. */
  def cdcChunkDedup(docs: DataFrame, divisor: Int = 16): DataFrame = {
    require(divisor >= 2, s"boundary divisor must be >= 2, got $divisor")
    val ex = docs.select(col("doc_id"), posexplode(words).as(Seq("pos", "word")))
    val wLead = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val win = concat_ws(" ", col("word"),
      lead(col("word"), 1).over(wLead),
      lead(col("word"), 2).over(wLead),
      lead(col("word"), 3).over(wLead))
    val boundary = when(col("pos") === 0 ||
      conv(substring(md5(win), 1, 6), 16, 10).cast("long") % divisor === 0,
      1L).otherwise(0L)
    val segs = ex
      .withColumn("seg", sum(boundary).over(
        wLead.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("seg"))
      .agg(min(col("pos")).as("spos"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(pos, word))), x -> x.word)"),
          " ").as("stext"))
    val shared = segs.groupBy(md5(col("stext")).as("h"))
      .agg((min(col("doc_id")) =!= max(col("doc_id"))).as("shared"))
    segs.join(shared, shared("h") === md5(segs("stext")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("shared"), 1L).otherwise(0L)).as("n_dropped"),
        md5(array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN NOT shared THEN " +
            "struct(spos, stext) END)), x -> x.stext)"), " ")).as("clean_md5"))
  }

  // ------------------------------------------------- source overlap
  /** Cross-source contamination matrix: for every ordered source pair
    * (a, b), the fraction of a's distinct word `n`-grams that also
    * occur in b — the "who mirrors whom" audit that decides whether
    * two crawl sources are independent evidence or the same content
    * twice (directional: a small site fully contained in a big
    * aggregator shows frac→1 in one direction only).
    *
    * Shape at 100 TB: the distinct (source, gram-md5) table is the
    * only corpus-scale object; the self-join equi-keys on the gram
    * hash, and its fan-out per gram is (sources carrying it)² —
    * bounded by the SOURCE cardinality, which is metadata-scale, not
    * corpus-scale. The matrix itself is |sources|² rows. Totals ride
    * a broadcast. */
  def sourceOverlap(docs: DataFrame, n: Int = 5): DataFrame = {
    val grams = docs.select(col("source"), explode(array_distinct(
        when(size(words) < n, array(col("text")))
          .otherwise(graft.functions.Native.wordNgrams(col("text"), n))))
        .as("g"))
      .select(col("source"), md5(col("g")).as("gh"))
      .distinct()
    val totals = grams.groupBy(col("source"))
      .agg(count(lit(1)).as("n_grams"))
    grams.alias("a").join(grams.alias("b"), Seq("gh"))
      .filter(col("a.source") =!= col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(totals.withColumnRenamed("source", "src_a")), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams")).as("overlap_frac"))
  }

  // --------------------------------------------------- curation funnel
  /** Per-source curation funnel: how many of each source's documents
    * survive each stage of the standard ladder — quality gate (q68's
    * frozen score ≥ threshold), exact dedup (min-id keeper of the
    * md5(text) group), eval decontamination (no distinct `n`-gram
    * shared with `evalDocs`) — each count CUMULATIVE (a doc counts in
    * stage k only if it passed every earlier stage), plus the final
    * survival rate in exact integer ppm. The accountability dashboard
    * a curation pipeline reports per crawl source: a source whose
    * funnel collapses at the dedup stage is a mirror; one collapsing
    * at decontamination is benchmark leakage.
    *
    * Shape at 100 TB: three flag tables, each the output of an
    * already-scale-shaped operator (one narrow map + one groupBy
    * each), joined back on doc_id and collapsed by ONE
    * partial-aggregable groupBy(source). The corpus frame feeds all
    * three — `materialize` (q54's hook, `_.localCheckpoint()`) pins it
    * so they don't each re-scan the corpus (PlanAudit flagged the
    * unpinned form at 7 scans). Nothing new shuffles text. */
  def curationFunnel(docs: DataFrame, evalDocs: DataFrame, n: Int = 5,
                     qualityThreshold: Double = 1.0,
                     materialize: DataFrame => DataFrame = identity): DataFrame = {
    val d = materialize(docs.select(col("doc_id"), col("source"), col("text")))
    val quality = CorpusOps.qualityScore(d, qualityThreshold)
      .select(col("doc_id"), col("keep"))
    val withHash = d.select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      .join(quality, Seq("doc_id"))
    // keeper election runs AFTER the quality gate — the stage order of
    // a real pipeline: a hash group whose min-id copy failed quality
    // must still keep its best surviving copy (electing over all docs
    // would misattribute the quality loss to the dedup stage)
    val keepers = withHash.filter(col("keep"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
    val contaminated = CorpusOps.decontaminate(d, evalDocs, n)
      .select(col("doc_id"), col("contaminated"))
    withHash
      .join(keepers, Seq("h"), "left")
      .join(contaminated, Seq("doc_id"))
      .withColumn("s1", col("keep"))
      .withColumn("s2", col("keep") && col("doc_id") === col("keep_id"))
      .withColumn("s3", col("s2") && !col("contaminated"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s1"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("s2"), 1L).otherwise(0L)).as("n_unique"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("n_clean"))
      .withColumn("survival_ppm", expr("(1000000 * n_clean) div n_docs"))
  }

  // ------------------------------------------------ leakage-free split
  /** Near-dup-aware train/val/test split: every document is assigned
    * by the md5 bucket of its near-dup CLUSTER representative (q61's
    * min-id component; docs in no cluster represent themselves), so a
    * document and its near-duplicates always land in the SAME split —
    * the plain per-doc hash split ([[CorpusOps.hashSplit]]) leaks
    * lightly-edited copies of training documents into eval, which
    * reads as generalization and is actually memorization. Same
    * bucket arithmetic as hashSplit, applied to the representative id.
    *
    * Shape: the cluster table is metadata-scale (only docs in some
    * near-dup pair); it LEFT-joins the corpus on doc_id and the
    * bucket is a narrow map — no new corpus-scale shuffle beyond the
    * pair generation itself. */
  def leakageFreeSplit(docs: DataFrame, clusters: DataFrame,
                       trainPct: Int = 96, valPct: Int = 2): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"percentages must partition 0-99: train=$trainPct val=$valPct")
    val rep = coalesce(col("component"), col("doc_id"))
    val bucket = conv(substring(md5(rep.cast("string")), 1, 6), 16, 10)
      .cast("bigint") % 100
    docs.select(col("doc_id"))
      .join(clusters.select(col("id").as("doc_id"), col("component")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), rep.as("rep"), bucket.as("bucket"),
        when(bucket < trainPct, lit("train"))
          .when(bucket < trainPct + valPct, lit("val"))
          .otherwise(lit("test")).as("split"))
  }

  // ----------------------------------------------------------- novelty
  /** Held-out n-gram novelty: for every evaluation-split document
    * (the [[CorpusOps.hashSplit]] val+test buckets), the fraction of
    * its distinct word `n`-grams that never occur in the train
    * split — high novelty means the held-out doc actually tests
    * generalization; near-zero means the split leaks (the complement
    * of [[CorpusOps.decontaminate]], measured from the eval side).
    *
    * Shape at 100 TB: the gram table is ONE narrow explode keyed by
    * the gram's md5 (constant width) — the split flag is a pure
    * function of doc_id ([[CorpusOps.hashSplit]]'s md5 bucket), so it
    * inlines into the same scan instead of joining, and `materialize`
    * pins the table so the train/eval branches don't re-explode the
    * corpus (q54's discipline; the PlanAudit sweep flagged the
    * join-and-rescan formulation at 4 scans). The match flag is a
    * co-partitioned left join on the gram key against the train
    * side's distinct grams, then ONE groupBy(doc_id). The train gram
    * set is corpus-sized — it must NOT broadcast, and doesn't: the
    * join shuffles both sides on the same key. */
  def ngramNovelty(docs: DataFrame, n: Int = 5, trainPct: Int = 96,
                   materialize: DataFrame => DataFrame = identity): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("bigint") % 100
    val grams = materialize(docs
      .select(col("doc_id"), (bucket < trainPct).as("in_train"), explode(array_distinct(
        when(size(words) < n, array(col("text")))
          .otherwise(graft.functions.Native.wordNgrams(col("text"), n))))
        .as("g"))
      .select(col("doc_id"), col("in_train"), md5(col("g")).as("gh")))
    val trainSet = grams.filter(col("in_train"))
      .select(col("gh")).distinct().withColumn("seen", lit(true))
    grams.filter(!col("in_train"))
      .join(trainSet, Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
  }
}
