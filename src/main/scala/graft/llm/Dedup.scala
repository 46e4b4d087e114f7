package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Four tiers, cheapest first — the standard corpus-dedup ladder:
  *   1. exact (hash group-by): one shuffle on the content hash;
  *   2. normalized exact: same, after canonicalization;
  *   3. MinHash + LSH banding: near-dup candidate pairs WITHOUT the
  *      O(n²) comparison — shingle, min-hash per band, shuffle on
  *      (band, band-signature) so only same-bucket docs ever meet;
  *   4. exact n-gram Jaccard on a length/lang-blocked candidate set —
  *      the verifier for tier-3 candidates (blocked so the pair join
  *      stays near-linear; never a full cross join).
  *
  * All hashing is md5 over explicit strings — deterministic across
  * engines, partitionings and runs (no seed state).
  */
object Dedup {

  /** Tier 1: corpus-level exact-duplicate summary. */
  def exactSummary(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
      .agg(
        count(lit(1)).as("n_distinct_texts"),
        sum(col("n")).as("n_docs"),
        sum(when(col("n") > 1, lit(1)).otherwise(lit(0))).as("n_dup_groups"),
        sum(col("n") - 1).as("n_rows_to_drop"))

  /** Tier 2: normalized dedup — keep the smallest doc_id per
    * canonical form; emits one row per kept doc with its group size. */
  def normalizedDedup(docs: DataFrame): DataFrame = {
    val canon = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    docs
      .groupBy(md5(canon).as("canon_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("group_size"))
  }

  /** Word shingles of size `n` over a precomputed `__words` column —
    * the split is hoisted out of the per-index lambda (a split inside
    * `transform` re-tokenizes the document for every shingle position:
    * quadratic per doc). */
  private[llm] def shingleExpr(n: Int): String =
    s"""CASE WHEN size(__words) < $n THEN array(text)
       |ELSE transform(sequence(1, size(__words) - ${n - 1}),
       |       i -> array_join(slice(__words, i, $n), ' '))
       |END""".stripMargin

  /** Tier 3a: MinHash signatures — ONE md5 per distinct shingle
    * (folded to a 48-bit integer), then `k` affine hash functions
    * h_i(x) = (a_i x + b_i) mod (2^31 - 1) over that integer: the
    * standard cheap min-wise family, 8x fewer digest calls than
    * hashing per (i, shingle). One narrow map, no shuffle; every
    * operation (md5, hex fold, affine mod) is expressible identically
    * in other engines, keeping the operator oracle-checkable. */
  def minhashSignatures(docs: DataFrame, k: Int = 8, shingle: Int = 3): DataFrame = {
    // native codegen'd expression (graft.functions.MinHashSignatures):
    // the HOF chain below ([[minhashSignaturesHof]], the parity
    // witness) runs one interpreted lambda per shingle per hash under
    // CodegenFallback — the dominant cost of every minhash consumer
    // (q42/q54/q67/q71) before the native path. Codegen CSE evaluates
    // the array expression once across the k projections.
    val arr = graft.functions.Native.minhashSignatures(col("text"), shingle, k)
    docs.select(col("doc_id") +:
      (0 until k).map(i => element_at(arr, i + 1).as(s"mh$i")): _*)
  }

  /** Reference higher-order-function formulation of
    * [[minhashSignatures]] — the cross-engine-portable SQL shape
    * (mirrors the DuckDB oracle text). Retained as the bit-parity
    * witness for the native expression. */
  private[graft] def minhashSignaturesHof(docs: DataFrame, k: Int = 8,
                                          shingle: Int = 3): DataFrame =
    docs
      .withColumn("__words", split(col("text"), " "))
      .withColumn("shingles", array_distinct(expr(shingleExpr(shingle))))
      // 12 hex chars = 48 bits: a_i * x stays below 2^63 (no int64
      // overflow in engines that check)
      .withColumn("xs",
        expr("transform(shingles, s -> CAST(conv(substr(md5(s), 1, 12), 16, 10) AS BIGINT))"))
      .select(col("doc_id") +: (0 until k).map { i =>
        val (a, b) = affine(i)
        array_min(expr(s"transform(xs, x -> ($a * x + $b) % $MersennePrime)"))
          .as(s"mh$i")
      }: _*)

  /** h_i coefficients. The modulus must be far below the 48-bit input
    * domain so the affine map actually wraps (a modulus above 2^48
    * would make h_i monotone in x — every h_i would pick the same
    * min-shingle and the signatures would collapse); 2^31 - 1 wraps
    * ~2^17 times per multiplier. a_i * x tops out near 2^62: inside
    * int64 for engines that check overflow. */
  private[llm] def affine(i: Int): (Int, Int) =
    graft.functions.MinHashSignatures.affine(i)
  private[llm] val MersennePrime: String =
    graft.functions.MinHashSignatures.MersennePrime.toString // 2^31 - 1

  /** Shared tier-3b bucket aggregation: one scan of `docs`, one
    * `posexplode` emitting the `bands` bucket keys per doc, one shuffle
    * on (band, bucket) → (band, bucket, sorted doc_id set). */
  private def lshBuckets(docs: DataFrame, k: Int, bands: Int,
                         shingle: Int): DataFrame =
    bucketsFromSigs(minhashSignatures(docs, k, shingle), k, bands)

  /** Band-bucket aggregation over an existing signature table — split
    * from [[lshBuckets]] so callers that also consume the signatures
    * ([[estimatedJaccardPairs]]) share ONE signature computation. */
  private def bucketsFromSigs(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    sigs
      .select(col("doc_id"),
        posexplode(array(bandBucketCols(k, bands): _*)).as(Seq("band", "bucket")))
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
  }

  /** The per-band bucket-key expressions over an mh0..mh(k-1) row —
    * THE band-key formula, shared by the in-memory bucket aggregation
    * ([[bucketsFromSigs]]) and the persisted index ([[bandedSigRows]])
    * so the two paths can never silently diverge. */
  private def bandBucketCols(k: Int, bands: Int): Seq[org.apache.spark.sql.Column] = {
    require(bands > 0 && k % bands == 0,
      s"k ($k) must divide evenly into bands ($bands): a remainder " +
        "silently drops signatures, and bands > k makes every bucket a " +
        "constant (one all-corpus bucket per band)")
    val rows = k / bands
    (0 until bands).map { b =>
      val cs = (b * rows until (b + 1) * rows).map(i => col(s"mh$i"))
      md5(concat_ws("|", cs: _*))
    }
  }

  /** Flat banded signature rows `(band, bucket, doc_id, sig[k])` — the
    * at-rest schema of the persisted LSH index ([[writeLshIndex]]):
    * one row per document per band, carrying the full k-component
    * signature so a probe can estimate Jaccard without touching
    * document text. */
  private def bandedSigRows(sigs: DataFrame, k: Int, bands: Int): DataFrame =
    sigs.select(col("doc_id"),
      array((0 until k).map(i => col(s"mh$i")): _*).as("sig"),
      posexplode(array(bandBucketCols(k, bands): _*)).as(Seq("band", "bucket")))

  /** Persist the corpus' MinHash-LSH signature index as a
    * `bucket`-bucketed catalog table — the structure that makes
    * "dedup the NEW batch against everything already ingested"
    * incremental: the index is k longs + `bands` band keys per doc
    * (metadata-scale, ~25-100x smaller than the corpus text), it
    * appends per ingestion wave without rescanning old waves, and a
    * batch probe never touches stored text at all. */
  def writeLshIndex(docs: DataFrame, table: String, k: Int = 8,
                    bands: Int = 4, shingle: Int = 3,
                    nBuckets: Int = 8): Unit =
    graft.operators.Bucketing.writeBucketed(
      bandedSigRows(minhashSignatures(docs, k, shingle), k, bands),
      table, "bucket", nBuckets)

  /** The index rows [[writeLshIndex]] stores, as a frame — for callers
    * that manage the index layout themselves (the streaming ingester
    * appends one epoch partition of these per micro-batch). */
  def lshIndexRows(docs: DataFrame, k: Int = 8, bands: Int = 4,
                   shingle: Int = 3): DataFrame =
    bandedSigRows(minhashSignatures(docs, k, shingle), k, bands)

  /** WITHIN-batch near-dup drops under the same signature-agreement
    * rule as [[dedupAgainstIndexDf]]: doc ids that share a band bucket
    * with a LOWER-id batch member agreeing on ≥ `minAgree` of k
    * minhashes. The streaming ingester applies this BEFORE the index
    * probe so two lightly-edited copies arriving in one wave can't
    * both slip past an index that knows neither. Returns the distinct
    * `doc_id`s to drop (min-id member of each group survives). */
  def inBatchNearDupDrops(batch: DataFrame, k: Int = 8, bands: Int = 4,
                          shingle: Int = 3, minAgree: Int = 4): DataFrame = {
    require(minAgree >= 1 && minAgree <= k,
      s"minAgree ($minAgree) must be within 1..$k")
    val rows = bandedSigRows(minhashSignatures(batch, k, shingle), k, bands)
    rows.alias("l").join(rows.alias("r"), Seq("band", "bucket"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("r.doc_id").as("doc_id"),
        col("l.sig").as("lsig"), col("r.sig").as("rsig"))
      .distinct()
      .filter(expr("size(filter(zip_with(lsig, rsig, (x, y) -> x = y), v -> v))")
        >= minAgree)
      .select(col("doc_id")).distinct()
  }

  /** Incremental near-dup against a [[writeLshIndex]] table: for every
    * batch document, find indexed documents sharing any LSH band
    * bucket, keep those agreeing on ≥ `minAgree` of the k minhash
    * components (the unbiased Jaccard estimate — `minAgree = 4` of 8
    * ≈ J ≥ 0.5, the q43 threshold), and surface the best match. Every
    * batch doc emits exactly one row (`is_dup = false` when nothing
    * collides), so the output IS the batch's admission decision.
    *
    * Shape at 100 TB: the batch side (one ingestion wave) is small by
    * contract — it BROADCASTS to the index scan, so the index is read
    * once with no shuffle and no text movement; candidate pairs
    * collapse to per-doc decisions via one partial-aggregable
    * `max_by` groupBy. A wave too large to broadcast passes
    * `broadcastProbe = false` and degrades to a shuffle join
    * co-located by the index's at-rest bucketing — the explicit hint
    * would otherwise override Spark's size check and force the
    * broadcast regardless. */
  def dedupAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                        table: String, batch: DataFrame, k: Int = 8,
                        bands: Int = 4, shingle: Int = 3,
                        minAgree: Int = 4,
                        corpus: DataFrame = null): DataFrame = {
    // staleness defense (opt-in here, because the probe BATCH is by
    // definition not the indexed corpus): an ingest pipeline that
    // holds the admitted corpus passes it and gets the same
    // refuse-on-mismatch contract as the ANN reads — an upserted /
    // re-crawled corpus must re-index before admitting more waves
    if (corpus != null)
      IndexStamp.verify(spark, table, corpus, "dedupAgainstIndex")
    dedupAgainstIndexDf(spark.table(table), batch, k, bands, shingle, minAgree)
  }

  /** [[dedupAgainstIndex]] over an index frame directly — the seam the
    * streaming ingester uses (its index lives as an epoch-partitioned
    * parquet directory rather than a catalog table). */
  def dedupAgainstIndexDf(idx: DataFrame, batch: DataFrame, k: Int = 8,
                          bands: Int = 4, shingle: Int = 3,
                          minAgree: Int = 4,
                          broadcastProbe: Boolean = true): DataFrame = {
    require(minAgree >= 1 && minAgree <= k,
      s"minAgree ($minAgree) must be within 1..$k")
    val probe = bandedSigRows(minhashSignatures(batch, k, shingle), k, bands)
    val probeSide =
      if (broadcastProbe) broadcast(probe.alias("n")) else probe.alias("n")
    val agree = idx.alias("i")
      .join(probeSide, Seq("band", "bucket"))
      .select(col("n.doc_id").as("doc_id"), col("i.doc_id").as("match_id"),
        col("n.sig").as("nsig"), col("i.sig").as("isig"))
      .distinct()
      .select(col("doc_id"), col("match_id"),
        expr("size(filter(zip_with(nsig, isig, (x, y) -> x = y), v -> v))")
          .cast("long").as("k_agree"))
      .filter(col("k_agree") >= minAgree)
    val best = agree.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        max_by(col("match_id"),
          struct(col("k_agree"), (-col("match_id")).as("t"))).as("best_match_id"),
        max(col("k_agree")).as("best_agree"))
    batch.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("best_match_id"), lit(-1L)).as("best_match_id"),
        coalesce(col("best_agree"), lit(0L)).as("best_agree"),
        (coalesce(col("best_agree"), lit(0L)).cast("double") / k)
          .as("est_jaccard"),
        col("best_agree").isNotNull.as("is_dup"))
  }

  /** Tier 3b result: candidate `pairs` (a, b) PLUS the `skippedBuckets`
    * (band, bucket, n_ids) the cap refused to expand — both views of
    * the SAME bucket aggregation, so the overflow signal cannot be
    * missed and costs no second corpus scan. `skippedBuckets` empty =
    * the cap never bit = `pairs` is complete. */
  final case class LshCandidates(pairs: DataFrame, skippedBuckets: DataFrame)

  /** LSH parameter planning: probability that a pair with Jaccard `s`
    * becomes a candidate under `bands` bands of `rows` minhash rows
    * each — the standard s-curve `1 - (1 - s^rows)^bands`. */
  def lshCollisionProb(s: Double, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rows), bands)

  /** Pick `(bands, rows)` for a signature budget of `k` minhashes and
    * a target similarity `threshold`: among the factorizations
    * `bands * rows = k`, the one whose s-curve inflection
    * `(1/bands)^(1/rows)` lands closest to the threshold — fewer
    * bands → fewer false positives below it, more bands → better
    * recall above it, and the inflection is where the curve is
    * steepest. Driver-side arithmetic over the divisors of `k`;
    * feed the result straight into [[lshCandidates]]'s `k`/`bands`. */
  def lshPlan(threshold: Double, k: Int = 8): (Int, Int) = {
    require(threshold > 0 && threshold < 1, s"threshold $threshold outside (0,1)")
    require(k >= 2, s"k ($k) must be at least 2")
    val options = (1 to k).filter(k % _ == 0)
      .map(b => (b, k / b))
    options.minBy { case (b, r) =>
      math.abs(math.pow(1.0 / b, 1.0 / r) - threshold)
    }
  }

  /** Tier 3b: MinHash-LSH candidates — signatures split into `bands`
    * bands of k/bands rows each; docs sharing any band signature become
    * a candidate pair.
    *
    * Plan shape: see [[lshBuckets]]; pairs are generated inside each
    * bucket from the sorted doc_id set — no self-join, no re-scan.
    * Bucket width is bounded by the band-signature collision rate (the
    * LSH guarantee) ONLY if exact duplicates were removed by tiers 1-2
    * first; because real corpora still grow degenerate buckets
    * (boilerplate that survives canonicalization), any bucket wider
    * than `maxBucket` is excluded from the pair explode rather than
    * materialized as one unbounded `collect_set` row with a quadratic
    * pair explode — and reported IN-BAND via `skippedBuckets`, which
    * shares this call's bucket plan (materialized once under the
    * `materialize` hook at scale). A pipeline should alert on it, and
    * either raise tiers 1-2 aggressiveness or treat whole skipped
    * buckets as duplicate clusters. */
  def lshCandidates(docs: DataFrame, k: Int = 8, bands: Int = 4,
                    shingle: Int = 3, maxBucket: Int = 1000,
                    materialize: DataFrame => DataFrame = identity): LshCandidates = {
    val buckets = materialize(lshBuckets(docs, k, bands, shingle))
    LshCandidates(
      pairs = pairsFromBuckets(buckets, maxBucket),
      skippedBuckets = buckets.filter(size(col("ids")) > maxBucket)
        .select(col("band"), col("bucket"), size(col("ids")).as("n_ids")))
  }

  /** Pairs-only view of [[lshCandidates]] — prefer the full result: a
    * caller consuming only this frame under a finite `maxBucket` cannot
    * see whether recall was reduced. Kept as the oracle-gate entry
    * point (the gate fixture has no over-cap buckets, asserted by its
    * spec). */
  def lshCandidatePairs(docs: DataFrame, k: Int = 8, bands: Int = 4,
                        shingle: Int = 3, maxBucket: Int = 1000): DataFrame =
    lshCandidates(docs, k, bands, shingle, maxBucket).pairs

  /** Expand capped buckets into candidate pairs (tail of
    * [[lshCandidatePairs]], split out so [[dedupCorpus]] can share ONE
    * bucket aggregation between the pairs and the overflow branch). */
  private def pairsFromBuckets(buckets: DataFrame, maxBucket: Int): DataFrame = {
    require(maxBucket >= 2, s"maxBucket ($maxBucket) must admit at least a pair")
    buckets
      .filter(size(col("ids")) <= maxBucket)
      // all (x, y) with x before y in the sorted bucket => x < y, so the
      // previous a < b semantics are preserved exactly.
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y -> struct(x AS a, y AS b))))"""
          .stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /** Sketch-based Jaccard ESTIMATION for the LSH candidate pairs: the
    * fraction of the `k` minhash components two docs agree on is an
    * unbiased estimate of their Jaccard similarity (the min-wise
    * hashing guarantee) — the cheap middle tier between banding
    * (boolean, coarse) and exact verification (needs both word sets):
    * rank or pre-filter candidates WITHOUT ever moving document text.
    *
    * Shape at 100 TB: signatures are k longs per doc (metadata-scale
    * next to the corpus); the candidate pairs join the signature table
    * twice on doc_id — two hash joins over narrow rows. With the
    * signature table persisted bucketed on doc_id
    * ([[graft.operators.Bucketing]]) both probes are exchange-free.
    * The estimate (`k_agree / k`) is integer arithmetic over a ratio
    * of small ints — exact in any engine.
    *
    * The signature table feeds three consumers (the band buckets and
    * both pair-side probes): `materialize` (e.g. `_.localCheckpoint()`)
    * runs the dominant shingle+digest scan ONCE at scale — the same
    * hook contract as [[lshCandidates]] and [[dedupCorpus]]. */
  def estimatedJaccard(docs: DataFrame, k: Int = 8, bands: Int = 4,
                       shingle: Int = 3, maxBucket: Int = 1000,
                       materialize: DataFrame => DataFrame = identity): LshCandidates = {
    val sigs = materialize(minhashSignatures(docs, k, shingle))
    val sigCols = (0 until k).map(i => col(s"mh$i"))
    val sigArr = sigs.select(col("doc_id"), array(sigCols: _*).as("sig"))
    val buckets = bucketsFromSigs(sigs, k, bands)
    val pairs = pairsFromBuckets(buckets, maxBucket)
      .join(sigArr.select(col("doc_id").as("a"), col("sig").as("siga")), Seq("a"))
      .join(sigArr.select(col("doc_id").as("b"), col("sig").as("sigb")), Seq("b"))
      .select(col("a"), col("b"),
        expr("size(filter(zip_with(siga, sigb, (x, y) -> x = y), v -> v))")
          .as("k_agree"))
      .select(col("a"), col("b"), col("k_agree"),
        (col("k_agree").cast("double") / k).as("est_jaccard"))
    LshCandidates(pairs = pairs,
      skippedBuckets = buckets.filter(size(col("ids")) > maxBucket)
        .select(col("band"), col("bucket"), size(col("ids")).as("n_ids")))
  }

  /** Pairs-only view of [[estimatedJaccard]] — prefer the full result:
    * under a finite `maxBucket`, over-wide buckets are dropped and a
    * caller consuming only this frame cannot tell whether recall was
    * reduced (same contract as [[lshCandidatePairs]]). Kept as the
    * oracle-gate entry. */
  def estimatedJaccardPairs(docs: DataFrame, k: Int = 8, bands: Int = 4,
                            shingle: Int = 3, maxBucket: Int = 1000,
                            materialize: DataFrame => DataFrame = identity): DataFrame =
    estimatedJaccard(docs, k, bands, shingle, maxBucket, materialize).pairs

  /** Overflow-only view of [[lshCandidates]] — prefer the full result
    * (one shared bucket plan; consuming the two views from separate
    * calls runs the dominant corpus scan twice). */
  def lshSkippedBuckets(docs: DataFrame, k: Int = 8, bands: Int = 4,
                        shingle: Int = 3, maxBucket: Int = 1000): DataFrame =
    lshCandidates(docs, k, bands, shingle, maxBucket).skippedBuckets

  /** Tier 4: exact Jaccard over distinct word sets, on a blocked
    * candidate set (same lang, |n_chars| within `lenTol`). Returns
    * pairs with similarity >= `threshold`.
    *
    * Blocking key is (lang, floor(n_chars / lenTol)): if two lengths are
    * within `lenTol` their buckets differ by at most 1, so side b emits
    * buckets {lb-1, lb, lb+1} and the equi-join on (lang, length-bucket)
    * finds every qualifying pair exactly once — the join key cardinality
    * scales with the corpus length distribution, never an all-pairs join
    * within a language. The exact |lena-lenb| <= lenTol predicate is
    * re-applied post-join to trim bucket-edge false candidates. */
  def jaccardPairs(docs: DataFrame, threshold: Double, lenTol: Int = 5): DataFrame = {
    // The repartition is a MATERIALIZATION BARRIER, not a distribution
    // choice: without an exchange between the tokenizing projection and
    // the pair join, whole-stage codegen binds `w` as a deferred
    // expression inside the join's match loop and re-tokenizes per
    // CANDIDATE PAIR — measured 43 s of the 58 s q61 spent at sf1 (vs
    // one tokenization per doc after the barrier). Both join sides
    // derive from this one frame, so ReuseExchange ships the tokenized
    // corpus through a single shuffle.
    // sorted: the verify tier counts intersections with the
    // allocation-free merge scan (SortedIntersectSize) instead of
    // per-pair hash sets
    val ws = docs.select(col("doc_id"), col("lang"), col("n_chars"),
      sort_array(array_distinct(split(col("text"), " "))).as("w"))
      .repartition(col("doc_id"))
    val a = ws.select(col("doc_id").as("a"), col("lang"),
        col("n_chars").as("lena"), col("w").as("wa"))
      .withColumn("lb", floor(col("lena") / lenTol))
    val b = ws.select(col("doc_id").as("b"), col("lang"),
        col("n_chars").as("lenb"), col("w").as("wb"))
      .withColumn("lb", explode(array(
        floor(col("lenb") / lenTol) - 1,
        floor(col("lenb") / lenTol),
        floor(col("lenb") / lenTol) + 1)))
    a.join(b, Seq("lang", "lb"))
      .filter(col("a") < col("b") && abs(col("lena") - col("lenb")) <= lenTol)
      .withColumn("inter", graft.functions.Native.sortedIntersectSize(
        col("wa"), col("wb")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("wa")) + size(col("wb")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Tier 4 alternative: exact all-pairs Jaccard join via PREFIX
    * FILTERING (Chaudhuri et al. 2006 / Bayardo et al. "Scaling Up
    * All Pairs Similarity Search", WWW'07) at threshold `p/q` —
    * COMPLETE by construction, unlike [[jaccardPairs]]'s length-bucket
    * blocking (bounded by `lenTol`) or [[containmentPairs]]'s df cap
    * (drops pairs sharing only ultra-common shingles): if
    * `J(A,B) ≥ p/q` the two prefix sets MUST intersect, so every
    * qualifying pair is a candidate. The pigeonhole argument: order
    * all tokens by ascending document frequency (token string breaks
    * ties — unique per doc, so both engines rank identically); a doc
    * with `sz` distinct tokens keeps the first
    * `sz - ceil(τ·sz) + 1` as its prefix. If B contains none of A's
    * prefix tokens, everything A shares with B sits in A's remaining
    * `ceil(τ·sza) - 1` tokens, so `|A∩B| < ceil(τ·sza)`; but
    * `J ≥ τ` forces `|A∩B| ≥ τ·|A∪B| ≥ τ·sza` — contradiction, so a
    * qualifying pair always collides on a prefix token.
    *
    * Rarest-first ordering is ALSO the fan-out control: posting lists
    * of prefix tokens are the shortest in the corpus (a token shared
    * by half the docs is in nobody's prefix unless a doc is nearly
    * all-common), and the integer size filter
    * `q·min(sza,szb) ≥ p·max(sza,szb)` prunes length-incompatible
    * candidates before the verify join. The threshold is the exact
    * rational `p/q` compared by integer cross-multiplication — no
    * float boundary rows to disagree across engines.
    *
    * Shape: one explode (co-keyed df join back), one per-doc window
    * for prefix positions (shuffle on doc_id, per-partition width =
    * doc length), one equi self-join on prefix tokens, verify joins
    * re-attach the two token arrays and check the exact intersection.
    * `materialize` pins the token-array table feeding the explode,
    * both verify sides, and the size filter (pass
    * `_.localCheckpoint()` at scale so the corpus tokenizes once).
    *
    * SATURATION GUARD: on a near-dup-saturated corpus the exact join
    * is output-bound quadratic by definition of the task (no
    * algorithm emits o(matches)), and pointing it at 100 TB of
    * saturated data by accident must fail fast, not melt the cluster.
    * `maxCandidatePairs > 0` bounds Σ_tok C(df_prefix,2) over the
    * prefix postings — an UPPER bound on generated candidates,
    * computed as one cheap aggregate over the (already-needed) prefix
    * table BEFORE the self-join is allowed to run — and aborts loudly,
    * naming the banded-LSH ladder (q42/q54) whose per-band fan-out
    * stays capped on exactly such corpora. The realized candidate
    * count is also surfaced on every run as the `candidate_pairs`
    * observed metric (`CollectMetrics` node, visible to listeners and
    * the Spark UI), so callers can watch the fan-out they actually
    * paid. */
  def prefixJaccardPairs(docs: DataFrame, p: Int = 3, q: Int = 5,
                         materialize: DataFrame => DataFrame = identity,
                         maxCandidatePairs: Long = 0L): DataFrame = {
    require(p > 0 && q > p, s"threshold p/q=$p/$q must lie in (0,1)")
    import org.apache.spark.sql.expressions.Window
    val ws = materialize(docs.select(col("doc_id"),
      sort_array(array_distinct(split(col("text"), " "))).as("w")))
    val tok = ws.select(col("doc_id"), size(col("w")).as("sz"),
      explode(col("w")).as("tok"))
    val dfs = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val pos = row_number().over(
      Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok")))
    val prefix0 = tok.join(dfs, Seq("tok"))
      .withColumn("pos", pos)
      .filter(col("pos") <= col("sz") - expr(s"($p * sz + ${q - 1}) div $q") + 1)
      .select(col("doc_id"), col("tok"), col("sz"))
    // with the guard on, the prefix table feeds the bound aggregate AND
    // both sides of the candidate join — a LAZY persist lets the bound
    // action prime the cache the join then reads, without the eager
    // write-out a localCheckpoint would add to the critical path. The
    // handle is not unpersisted here (the returned DataFrame's join
    // still reads it); once the caller drops the result, the
    // ContextCleaner's reference tracking unpersists the unreachable
    // cached RDD — the bench harness additionally unpersists all
    // blocks between timings
    val prefix = if (maxCandidatePairs > 0L)
      prefix0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else prefix0
    if (maxCandidatePairs > 0L) {
      val boundRow = prefix.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2")).as("pairs")).head()
      val bound = if (boundRow.isNullAt(0)) 0L else boundRow.getLong(0)
      if (bound > maxCandidatePairs)
        throw new IllegalStateException(
          s"prefix-Jaccard saturation guard: prefix postings imply up to " +
            s"$bound candidate pairs (> cap $maxCandidatePairs) — the corpus " +
            "is near-dup saturated and the exact all-pairs join is " +
            "output-bound quadratic here; use the banded LSH near-dup " +
            "ladder (minhashBands / q42, q54) whose per-band fan-out stays " +
            "capped, or raise maxCandidatePairs deliberately")
    }
    val cand = prefix.select(col("doc_id").as("a"), col("tok"), col("sz").as("sza"))
      .join(prefix.select(col("doc_id").as("b"), col("tok"), col("sz").as("szb")),
        Seq("tok"))
      .filter(col("a") < col("b") &&
        col("sza") * q >= col("szb") * p && col("szb") * q >= col("sza") * p)
      .select(col("a"), col("b")).distinct()
      .observe("prefix_jaccard", count(lit(1)).as("candidate_pairs"))
    cand
      .join(ws.select(col("doc_id").as("a"), col("w").as("wa")), Seq("a"))
      .join(ws.select(col("doc_id").as("b"), col("w").as("wb")), Seq("b"))
      .withColumn("inter_sz",
        graft.functions.Native.sortedIntersectSize(col("wa"), col("wb"))
          .cast("long"))
      .withColumn("union_sz",
        (size(col("wa")) + size(col("wb"))).cast("long") - col("inter_sz"))
      .filter(col("inter_sz") * q >= col("union_sz") * p)
      .select(col("a"), col("b"), col("inter_sz"), col("union_sz"))
  }

  /** ASYMMETRIC near-dup: containment `C(A→B) = |S(A)∩S(B)| / |S(A)|`
    * over distinct word `n`-gram sets — the metric Jaccard misses
    * when a small document lives INSIDE a large one (quotes, nested
    * boilerplate, excerpt pages): a 50-word doc fully contained in a
    * 5000-word doc has Jaccard ≈ 0.01 but containment 1.0. Emits
    * both directions per pair; `containment_ab` reads "this fraction
    * of A is in B".
    *
    * Scale shape (q105's df-cap discipline): candidates block on
    * SHARED shingles with document frequency ≤ `maxDf` — the pair
    * fan-out is bounded by Σ df² over kept shingles, never all-pairs,
    * and boilerplate shingles above the cap can't explode the join
    * (a pair sharing ONLY ultra-common shingles is noise by
    * construction). Exact counts verify candidates: the intersection
    * count uses ALL shingles of the pair (the cap only gates
    * candidacy, not the metric). The kept-shingle intersection count
    * falls straight out of the candidate self-join's own groupBy — no
    * pair materialize/distinct, no re-join of the full shingle table
    * (the round-6 shape did both: measured 12.7 s → 2 s class at
    * sf0.1) — and the capped shingles' contribution is restored by a
    * side path that joins ONLY capped postings against the candidate
    * pairs (empty unless a shingle actually exceeds the cap). One
    * shuffle per stage, every aggregate partial map-side; the two
    * divisions are single IEEE ops on exact integers. */
  def containmentPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.6,
                       maxDf: Int = 500,
                       materialize: DataFrame => DataFrame = identity): DataFrame = {
    // the shingle table feeds six consumers (df split, both candidate
    // sides, sizes, both capped-verify sides) — `materialize` is the
    // scale hook (q54's discipline, pass `_.localCheckpoint()`):
    // without it the corpus re-shingles per consumer (measured: 13
    // FileScans at the default identity)
    val sh = materialize(docs.select(col("doc_id"), explode(array_distinct(
        when(size(split(col("text"), " ")) < n, array(col("text")))
          .otherwise(graft.functions.Native.wordNgrams(col("text"), n))))
      .as("g")))
    val dfs = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val shK = sh.join(dfs.filter(col("df") <= maxDf).select(col("g")), Seq("g"))
    // shared KEPT shingles per pair: candidacy and (usually all of)
    // the intersection count in ONE self-join + partial groupBy
    val kept = shK.select(col("doc_id").as("a"), col("g"))
      .join(shK.select(col("doc_id").as("b"), col("g")), Seq("g"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_kept"))
    // capped shingles still count toward the exact intersection, but
    // their postings join ONLY against already-found candidate pairs,
    // so the cap keeps bounding the fan-out
    val shC = sh.join(dfs.filter(col("df") > maxDf).select(col("g")), Seq("g"))
    val capped = kept.select(col("a"), col("b"))
      .join(shC.select(col("doc_id").as("a"), col("g")), Seq("a"))
      .join(shC.select(col("doc_id").as("b"), col("g")), Seq("b", "g"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_capped"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    kept
      .join(capped, Seq("a", "b"), "left")
      .withColumn("n_shared",
        col("n_kept") + coalesce(col("n_capped"), lit(0L)))
      .join(sizes.select(col("doc_id").as("a"), col("nsh").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("nsh").as("nb")), Seq("b"))
      .select(col("a"), col("b"), col("n_shared"),
        (col("n_shared").cast("double") / col("na").cast("double"))
          .as("containment_ab"),
        (col("n_shared").cast("double") / col("nb").cast("double"))
          .as("containment_ba"))
      .filter(greatest(col("containment_ab"), col("containment_ba"))
        >= threshold)
      .orderBy(col("a"), col("b"))
  }

  /** Exact Jaccard verification of a given candidate pair list:
    * attaches similarity to each (a, b) pair — two hash joins against
    * the docs' distinct word sets, linear in candidates. */
  def verifyPairs(docs: DataFrame, pairs: DataFrame, threshold: Double): DataFrame = {
    val ws = docs.select(col("doc_id"),
      sort_array(array_distinct(split(col("text"), " "))).as("w"))
    pairs
      .join(ws.select(col("doc_id").as("a"), col("w").as("wa")), Seq("a"))
      .join(ws.select(col("doc_id").as("b"), col("w").as("wb")), Seq("b"))
      .withColumn("inter", graft.functions.Native.sortedIntersectSize(
        col("wa"), col("wb")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("wa")) + size(col("wb")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** The whole ladder as ONE operator — what a training-data pipeline
    * actually calls. Returns every doc with (keep, drop_reason,
    * lsh_overflow):
    *   1+2. normalized/exact duplicates collapse to the smallest doc_id
    *        per canonical form ("normalized_dup");
    *   3.   MinHash-LSH proposes candidate near-dup pairs over the
    *        survivors (bucketed, never all-pairs);
    *   4.   exact Jaccard verifies candidates; of each verified pair
    *        the larger doc_id drops ("near_dup" — greedy keep-smallest,
    *        the standard corpus-dedup rule).
    * Every stage is a bounded join or aggregation — no iteration, no
    * driver state; the plan is a DAG of shuffles on md5/bucket keys.
    *
    * `lsh_overflow = true` marks a survivor with at least one over-cap
    * band bucket: near-dup detection was PARTIAL for it — candidates
    * from the overflowed band(s) were not generated, though the doc can
    * still match (and drop) through another, narrower band. The cap is
    * thus observable per-doc in the verdict itself — a pipeline alerts
    * on `count(lsh_overflow)` and either tightens tiers 1-2 or treats
    * whole overflow buckets as duplicate clusters; nothing is silently
    * capped.
    *
    * The survivors slice feeds three branches (candidates, verify,
    * final verdict join) and Catalyst recomputes the canonicalization
    * regex per branch. `materialize` is the scale hook: the default
    * `identity` keeps the operator a pure lazy plan (no leaked cached
    * state); at corpus scale pass `_.localCheckpoint()` (or
    * `_.persist(...)`) and each shared slice (`t12`, `survivors`) is
    * computed once instead of per branch — the dominant scan runs 1x,
    * not 3x. */
  def dedupCorpus(docs: DataFrame, threshold: Double = 0.8,
                  k: Int = 8, bands: Int = 4, shingle: Int = 3,
                  maxBucket: Int = 1000,
                  materialize: DataFrame => DataFrame = identity): DataFrame = {
    val canon = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val withCanon = docs.withColumn("canon_hash", md5(canon))
    val keepPerCanon = withCanon.groupBy(col("canon_hash"))
      .agg(min(col("doc_id")).as("canon_keep_id"))
    val t12 = materialize(withCanon.join(keepPerCanon, Seq("canon_hash"))
      .withColumn("normalized_dup", col("doc_id") =!= col("canon_keep_id")))
    val survivors = materialize(t12.filter(!col("normalized_dup"))
      .select(docs.columns.map(col): _*))
    // ONE bucket aggregation feeds both the pairs and the overflow
    // branch (the hook materializes it once at scale)
    val buckets = materialize(lshBuckets(survivors, k, bands, shingle))
    val candidates = pairsFromBuckets(buckets, maxBucket)
    val overflowIds = buckets.filter(size(col("ids")) > maxBucket)
      .select(explode(col("ids")).as("doc_id")).distinct()
      .withColumn("overflow", lit(true))
    val nearDupIds = verifyPairs(survivors, candidates, threshold)
      .select(col("b").as("doc_id")).distinct()
      .withColumn("near_dup", lit(true))
    t12.join(nearDupIds, Seq("doc_id"), "left")
      .join(overflowIds, Seq("doc_id"), "left")
      .select(docs.columns.map(col) :+
        (!col("normalized_dup") && col("near_dup").isNull).as("keep") :+
        when(col("normalized_dup"), lit("normalized_dup"))
          .when(col("near_dup").isNotNull, lit("near_dup"))
          .as("drop_reason") :+
        coalesce(col("overflow"), lit(false)).as("lsh_overflow"): _*)
  }

  /** SimHash fingerprints: 32 bit positions; bit j is the sign of the
    * sum over the doc's distinct words of ±1 votes — vote j is BIT j of
    * ONE md5-derived 48-bit integer per word (md5 bits are uniform and
    * independent), not a separate digest per (j, word): one digest per
    * word instead of `bits`, the same one-digest trick as tier 3a.
    * Near-dup docs agree on most bits; emitted as a bit string
    * (hamming-comparable, engine-portable). */
  def simhash(docs: DataFrame, bits: Int = 32): DataFrame = {
    require(bits <= 48, "votes are drawn from a 48-bit word hash")
    // native codegen'd expression (graft.functions.SimHashFingerprint):
    // the HOF fold below ([[simhashHof]], the parity witness) rebuilds
    // a bits-wide boxed vote array per word under CodegenFallback —
    // the dominant cost of q44/q55 before the native path
    docs.select(col("doc_id"),
      graft.functions.Native.simhashFingerprint(col("text"), bits).as("simhash"))
  }

  /** Reference higher-order-function formulation of [[simhash]] — the
    * cross-engine-portable SQL shape (mirrors the DuckDB oracle text).
    * Retained as the bit-parity witness for the native expression.
    * ONE fold carrying a bits-wide vote vector, NOT one aggregate per
    * bit: `bits` separate aggregates re-walk the array per bit and
    * blow the codegen method limit (measured 5.9s vs 0.6s, 48 bits,
    * sf0.1). */
  private[graft] def simhashHof(docs: DataFrame, bits: Int = 32): DataFrame = {
    require(bits <= 48, "votes are drawn from a 48-bit word hash")
    docs
      .withColumn("w", array_distinct(split(col("text"), " ")))
      .withColumn("xs",
        expr("transform(w, x -> CAST(conv(substr(md5(x), 1, 12), 16, 10) AS BIGINT))"))
      .withColumn("votes", expr(
        s"""aggregate(xs, array_repeat(0, $bits),
           |  (acc, x) -> transform(acc, (a, j) ->
           |    a + CASE WHEN (shiftright(x, j) & 1) = 1 THEN 1 ELSE -1 END))"""
          .stripMargin))
      .withColumn("simhash", expr(
        "array_join(transform(votes, v -> CASE WHEN v > 0 THEN '1' ELSE '0' END), '')"))
      .select(col("doc_id"), col("simhash"))
  }

  /** SimHash near-dup pairs via the pigeonhole multi-index: any two
    * fingerprints within `maxHamming` bits agree EXACTLY on at least
    * one of the `bands` bit-bands (pigeonhole needs
    * `bands >= maxHamming + 1`), so an equi-join on (band, band-bits)
    * finds every qualifying pair without an all-pairs Hamming scan —
    * the standard trick for simhash dedup at web scale. Candidates then
    * verify with `bit_count(xor)` over the full fingerprint, removing
    * band-collision false positives.
    *
    * Same bucket discipline as MinHash-LSH ([[lshCandidatePairs]]):
    * per-(band, bits) sorted-set buckets, pair explode inside the
    * bucket, degenerate buckets excluded by `maxBucket` — never
    * all-pairs, bounded row width. Returns (a, b, hamming), a < b.
    *
    * The fingerprint slice feeds three branches (bucket aggregation +
    * both verify-join sides); `materialize` is the same scale hook as
    * [[dedupCorpus]]'s — pass `_.localCheckpoint()` at corpus scale so
    * the dominant fingerprint scan runs once, not 3x. */
  def simhashNearDupPairs(docs: DataFrame, bits: Int = 32, bands: Int = 4,
                          maxHamming: Int = 3, maxBucket: Int = 1000,
                          materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(bits % bands == 0, s"bands ($bands) must divide bits ($bits)")
    require(bands >= maxHamming + 1,
      s"pigeonhole: bands ($bands) must exceed maxHamming ($maxHamming) " +
        "or the band join misses qualifying pairs")
    val width = bits / bands
    val sh = materialize(simhash(docs, bits))
    val bandCols = (0 until bands).map(b =>
      substring(col("simhash"), b * width + 1, width))
    val buckets = sh
      .select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "bucket")))
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    // fingerprint as a long: verify is one codegen'd xor + popcount
    val hv = sh.select(col("doc_id"),
      conv(col("simhash"), 2, 10).cast("long").as("h"))
    pairsFromBuckets(buckets, maxBucket)
      .join(hv.select(col("doc_id").as("a"), col("h").as("ha")), Seq("a"))
      .join(hv.select(col("doc_id").as("b"), col("h").as("hb")), Seq("b"))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }
}
