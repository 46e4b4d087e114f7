package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic negative-pair sampling for contrastive training
  * sets: for every anchor item, pick `k` pseudo-random negatives
  * (items with a DIFFERENT label) from a hash-selected candidate
  * pool.
  *
  * The naive formulation is an anchors × corpus cross join ranked by
  * a random key — O(N²) and nondeterministic. This shapes it for
  * scale and replay:
  *
  *   - the POOL is a hash-predicate sample of the corpus
  *     (`poolPerMille`‰ of items, chosen by id hash, no data
  *     movement) — at 100 TB it is the only side that replicates, and
  *     it stays broadcast-size by construction (a 1‰ pool of a
  *     billion-item corpus is a million rows of (id, label));
  *   - the "random" preference of anchor a for candidate c is a pure
  *     integer hash of (a, c) — reruns, retries, and different
  *     partitionings all draw the SAME negatives, so a training set
  *     is reproducible from its config alone (and the DuckDB oracle
  *     can recompute it exactly: the mix uses only modular arithmetic
  *     that never overflows a signed 64-bit int);
  *   - per-anchor top-k runs as the bounded-heap
  *     [[graft.functions.TopKBy]] aggregate — constant-size state
  *     map-side, ONE shuffle of k-row partials per anchor, no window
  *     sort of the anchors × pool candidate set.
  */
object NegativeSampling {

  /** Pool membership: a `perMille`‰ deterministic sample by id hash.
    * Knuth multiplicative step; the product is ≤ id_max × 2^31.58 —
    * safe in signed 64-bit for any realistic id space. */
  def inPool(id: Column, perMille: Int): Column =
    pmod(id * lit(2654435761L), lit(1000L)) < lit(perMille.toLong)

  /** Anchor→candidate preference key: a deterministic integer mix both
    * Spark and any SQL oracle evaluate identically (operands are
    * pre-reduced mod 100003, so products stay ≤ 100003 × 73856093 ≈
    * 2^42.7 — no overflow, no engine-specific hash). Collisions tie-
    * break on candidate id downstream. */
  def rankKey(anchor: Column, cand: Column): Column =
    pmod(
      pmod(anchor, lit(100003L)) * lit(73856093L) +
        pmod(cand, lit(100003L)) * lit(19349663L),
      lit(2147483647L))

  /** `items` must carry (`idCol`, `labelCol`). Returns one row per
    * (anchor, rank 1..k): `anchor_id`, `rank`, `neg_id` — the k
    * pool candidates with a different label, in deterministic
    * preference order. */
  def negatives(items: DataFrame, idCol: String, labelCol: String,
                k: Int, poolPerMille: Int): DataFrame = {
    require(k >= 1 && poolPerMille >= 1)
    val pool = items
      .filter(inPool(col(idCol), poolPerMille))
      .select(col(idCol).as("neg_id"), col(labelCol).as("neg_label"))
    val anchors = items.select(col(idCol).as("anchor_id"), col(labelCol))
    anchors
      .join(broadcast(pool), col("neg_label") =!= col(labelCol))
      .groupBy(col("anchor_id"))
      .agg(graft.functions.Native.topKBy(
        -rankKey(col("anchor_id"), col("neg_id")), col("neg_id"), k).as("tk"))
      .select(col("anchor_id"), posexplode(col("tk")))
      .select(col("anchor_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.payload").as("neg_id"))
  }

  /** HARD negative mining: the k pool candidates most similar to the
    * anchor (highest embedding cosine) with a DIFFERENT label — the
    * negatives that actually move a contrastive loss, vs
    * [[negatives]]' uniform draw.
    *
    * Same scale skeleton (broadcast pool, bounded-heap top-k, one
    * shuffle); the ranking key is the micro-unit integer cosine
    * (q93's discipline: `floor(cos·10⁶ + 0.5)` as a long — plain
    * IEEE double ops every engine evaluates bit-identically, unlike
    * engine `round()`, whose half-way behavior differs between
    * Spark's BigDecimal HALF_UP and DuckDB's multiply-then-round),
    * so ranks and the surfaced `cos_sim = micro / 10⁶` are
    * bit-reproducible across engines and partitionings. `items`
    * needs (`idCol`, `labelCol`, `embCol`: array of float/double). */
  def hardNegatives(items: DataFrame, idCol: String, labelCol: String,
                    embCol: String, k: Int, poolPerMille: Int): DataFrame = {
    require(k >= 1 && poolPerMille >= 1)
    val pool = items
      .filter(inPool(col(idCol), poolPerMille))
      .select(col(idCol).as("neg_id"), col(labelCol).as("neg_label"),
        col(embCol).as("ne"), Similarity.norm(col(embCol)).as("nn"))
    val anchors = items.select(col(idCol).as("anchor_id"), col(labelCol),
      col(embCol).as("ae"), Similarity.norm(col(embCol)).as("na"))
    anchors
      .join(broadcast(pool), col("neg_label") =!= col(labelCol))
      .withColumn("cos_micro",
        floor(Similarity.cosineWithNorms(col("ae"), col("ne"),
          col("na"), col("nn")) * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy(col("anchor_id"))
      .agg(graft.functions.Native.topKBy(
        col("cos_micro"), col("neg_id"), k).as("tk"))
      .select(col("anchor_id"), posexplode(col("tk")))
      .select(col("anchor_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.payload").as("neg_id"),
        (col("col.ord").cast("double") / lit(1e6)).as("cos_sim"))
  }
}
