package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - [[cosineTopK]]: brute-force exact top-k — the correctness
  *     baseline. The (few) query vectors broadcast; one narrow pass
  *     over the corpus computes cosines, then a per-query top-k. At
  *     100 TB this is the "small query batch x huge corpus" shape:
  *     linear scan, no shuffle except the final per-query k rows.
  *   - [[lshBuckets]] / [[annTopKInBucket]]: the scale path — random-
  *     hyperplane LSH. Hyperplane components are derived from md5
  *     (deterministic, no RNG state), each vector gets a `nPlanes`-bit
  *     bucket; search only compares within a bucket, pruning the
  *     corpus by ~2^nPlanes. (An IVF variant would k-means the corpus;
  *     hyperplane LSH needs no training pass, which keeps the operator
  *     stateless — the right trade-off for a pipeline operator.)
  *
  * Dot products run in double via `aggregate` over `zip_with` —
  * sequential left-fold in index order, bit-reproducible.
  */
object Similarity {

  /** dot(x, y) as a fold in index order (deterministic) — the native
    * codegen'd [[graft.functions.DotProduct]] (same left-to-right IEEE
    * fold as [[dotHof]], pinned bit-identical by its spec; the HOF
    * chain ran interpreted under CodegenFallback per element). */
  def dot(x: Column, y: Column): Column =
    graft.functions.Native.dotProduct(x, y)

  /** The higher-order-function formulation [[dot]] replaced — kept as
    * the executable parity witness (same role as `simhashHof`). */
  private[graft] def dotHof(x: Column, y: Column): Column = aggregate(
    zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
    lit(0.0), (acc, v) => acc + v)

  /** ||v|| — precompute ONCE per row and thread through joins: inside
    * a pairwise score it would otherwise be refolded per candidate
    * pair (e.g. 50x per vector in the IVF assignment). */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** cosine(a, b) with precomputed norms; the division order matches
    * [[cosine]] exactly so values stay bit-identical. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / na / nb

  /** cosine(a, b) as a fold in index order (deterministic). */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, norm(a), norm(b))

  /** Exact top-k cosine neighbors for each query vector (queries =
    * rows of `embeddings` whose vec_id is in `queryIds`). */
  def cosineTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = embeddings.withColumn("nv", norm(col("embedding")))
    val q = e.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
              col("nv").as("nq"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(cosineWithNorms(col("qe"), col("embedding"),
        col("nq"), col("nv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos_sim"))
  }

  /** Deterministic hyperplane component for (plane, dim index): ±1 from
    * one md5 hex digit — the same formula any engine with md5 can
    * reproduce (the oracle computes it per row in SQL; here it is
    * hoisted to a constant). */
  private def planeComponent(plane: Int, j: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane|$j".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) < 8) -1.0 else 1.0
  }

  /** Assign each vector an LSH bucket: bit i = sign of dot(v, plane_i).
    *
    * The hyperplanes are CONSTANTS: they are materialized once on the
    * driver as literal arrays (one tiny metadata read for the vector
    * dimension) instead of being re-derived per row per component —
    * which would cost nPlanes x dim digest calls per vector. The
    * per-row work is then nPlanes fused multiply-add folds. Assumes a
    * homogeneous embedding dimension (the norm for an embedding
    * column). */
  def lshBuckets(embeddings: DataFrame, nPlanes: Int = 8): DataFrame = {
    val dim = embeddings.select(size(col("embedding"))).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0) // empty corpus: 0 rows out anyway
    val bits = (0 until nPlanes).map { p =>
      val plane = (0 until dim).map(planeComponent(p, _)).toArray
      val dotP = aggregate(
        zip_with(col("embedding"), typedlit(plane),
                 (v, h) => v.cast("double") * h),
        lit(0.0), (acc, x) => acc + x)
      when(dotP > 0, lit("1")).otherwise(lit("0"))
    }
    embeddings.withColumn("bucket", concat(bits: _*))
  }

  /** Bucket occupancy — the partition-balance diagnostic for the ANN
    * index (skewed buckets -> salt or add planes). */
  def bucketHistogram(embeddings: DataFrame, nPlanes: Int = 8): DataFrame =
    lshBuckets(embeddings, nPlanes)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec_id"))

  /** ANN: top-k within the query's bucket only (the pruned search). */
  def annTopKInBucket(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                      nPlanes: Int = 8): DataFrame = {
    val all = lshBuckets(embeddings, nPlanes).withColumn("nv", norm(col("embedding")))
    val q = all.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
              col("nv").as("nq"), col("bucket"))
    val scored = all.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(cosineWithNorms(col("qe"), col("embedding"),
        col("nq"), col("nv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos_sim"))
  }

  /** Embedding-cosine near-duplicate pairs (the dedup ladder's
    * embedding tier): candidates meet only inside an LSH bucket —
    * the equi-join on `bucket` prunes the pair space by ~2^nPlanes,
    * never an all-pairs join — then the exact cosine filters to
    * `threshold`. Same candidate-then-verify shape as the MinHash
    * ladder, over vectors instead of shingles. */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double,
                            nPlanes: Int = 8): DataFrame = {
    // both join sides are the SAME projected plan (aliased, not
    // re-selected): the two shuffle exchanges canonicalize identically,
    // so the bucket computation runs once and the second side reads the
    // ReusedExchange instead of recomputing nPlanes dot products per row
    // the merge hint keeps BOTH sides as shuffle exchanges (a broadcast
    // side would be a different exchange and defeat the reuse; it is
    // also the wrong physical choice for a corpus-sized self-join)
    val all = lshBuckets(embeddings, nPlanes)
      .withColumn("nv", norm(col("embedding")))
      .select(col("bucket"), col("vec_id"), col("embedding"), col("nv"))
      .hint("merge")
    all.alias("l").join(all.alias("r"), Seq("bucket"))
      .filter(col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos_sim", round(cosineWithNorms(col("l.embedding"),
        col("r.embedding"), col("l.nv"), col("r.nv")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"), col("cos_sim"))
  }

  /** IVF coarse quantization with deterministic centroids: every
    * `centStride`-th vector is a centroid (no training pass, engine-
    * portable); each vector is assigned to its max-cosine centroid.
    * The centroid set broadcasts; assignment is one narrow pass. */
  def ivfAssign(embeddings: DataFrame, centStride: Long = 100): DataFrame = {
    val e = embeddings.withColumn("nv", norm(col("embedding")))
    val cents = e.filter(col("vec_id") % centStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"),
              col("nv").as("nc"))
    // argmax via max_by with a deterministic tie-break (highest sim,
    // then lowest cent_id): a partial-aggregable groupBy — map-side
    // combine, no per-vector sort — where a row_number window would
    // shuffle and sort every (vector, centroid) pair
    e.join(broadcast(cents))
      .withColumn("cent_sim", round(cosineWithNorms(col("embedding"), col("ce"),
        col("nv"), col("nc")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("embedding"), col("cent_id")),
        struct(col("cent_sim"), (-col("cent_id")).as("tie"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
              col("best.cent_id").as("cent_id"))
  }

  /** IVF ANN: probe the `nprobe` nearest centroid cells per query and
    * search only their members — the trained-index counterpart of
    * [[annTopKInBucket]] (bigger cells, tunable recall via nprobe).
    * At scale the assigned table is written bucketed by `cent_id`, so
    * the probe join is a pruned scan of nprobe cells per query. */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              nprobe: Int = 2, centStride: Long = 100): DataFrame = {
    val assigned = ivfAssign(embeddings, centStride)
      .withColumn("nv", norm(col("embedding")))
    searchCells(assigned, probeSet(embeddings, queryIds, nprobe, centStride), k)
  }

  /** (query_id, qe, nq, cent_id): each query's `nprobe` max-cosine
    * centroid cells, ties to the lower cent_id — shared by the direct
    * and the indexed search so their probe semantics can never drift. */
  private def probeSet(embeddings: DataFrame, queryIds: Seq[Long],
                       nprobe: Int, centStride: Long): DataFrame = {
    val cents = embeddings.filter(col("vec_id") % centStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"),
              norm(col("embedding")).as("nc"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("cent_id"))
    embeddings.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
              norm(col("embedding")).as("nq"))
      .join(broadcast(cents))
      .withColumn("cent_sim", round(cosineWithNorms(col("qe"), col("ce"),
        col("nq"), col("nc")), 6))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qe"), col("nq"), col("cent_id"))
  }

  /** Search the probed cells: equi-join cell members to the (small,
    * broadcast) probe set, cosine, per-query top-k. `assigned` carries
    * (vec_id, embedding, nv, cent_id); `probes` (query_id, qe, nq,
    * cent_id). */
  private def searchCells(assigned: DataFrame, probes: DataFrame,
                          k: Int): DataFrame = {
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(cosineWithNorms(col("qe"), col("embedding"),
        col("nq"), col("nv")), 6))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos_sim"))
  }

  /** Symmetric per-vector int8 quantization: `scale = max|x| / 127`,
    * `q_i = round(x_i / scale)` — the standard 4x storage/bandwidth cut
    * for an embedding corpus (at 100 TB of float32 vectors the scan is
    * bandwidth-bound, so int8 is ~4x faster too). Max reconstruction
    * error is `scale / 2`, surfaced per vector as `max_abs_err` so a
    * pipeline can gate on quantization loss. Zero vectors quantize to
    * zeros (scale 0 guard). One narrow codegen'd pass, no shuffle.
    * Returns (vec_id, n_dims, scale, qvec, max_abs_err). */
  def quantizeInt8(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("scale", expr("array_max(transform(v, x -> abs(x))) / 127.0"))
      .withColumn("qvec", expr(
        "transform(v, x -> CASE WHEN scale = 0.0 THEN 0 " +
          "ELSE CAST(round(x / scale) AS INT) END)"))
      .withColumn("max_abs_err",
        expr("array_max(zip_with(v, qvec, (x, q) -> abs(x - q * scale)))"))
      .select(col("vec_id"), size(col("qvec")).as("n_dims"), col("scale"),
              col("qvec"), col("max_abs_err"))

  /** Sign-bit binary quantization: pack each embedding's sign pattern
    * into 32-bit words stored as BIGINTs (bit j of word w set iff
    * `v[32w + j] > 0`) — 1 bit per dimension, a 32x at-rest shrink vs
    * float32, the coarsest tier of the quantization ladder (int8 =
    * [[quantizeInt8]], PQ codes = [[writeIvfPqIndex]]). 32 bits per
    * word rather than 64 so the packed value never touches the BIGINT
    * sign bit — both engines then agree without unsigned-shift
    * gymnastics. Codegen'd end to end (transform/aggregate HOFs over
    * primitives, no UDF). */
  private[graft] def signWordsExpr(v: String): String =
    s"""transform(sequence(0, (size($v) + 31) div 32 - 1),
       |  w -> aggregate(sequence(0, 31), 0L,
       |    (acc, j) -> CASE WHEN 32 * w + j < size($v)
       |        AND element_at($v, CAST(32 * w + j + 1 AS INT)) > 0.0
       |      THEN acc + shiftleft(1L, j) ELSE acc END))""".stripMargin

  /** Hamming distance between two packed sign patterns: popcount of
    * the per-word XOR, summed in index order. */
  private[graft] def hammingExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> bit_count(x ^ y)), 0, (acc, h) -> acc + h)"

  /** Binary-quantized ANN: Hamming top-`mult*k` over packed sign bits,
    * then exact-cosine rerank of the survivors — the standard
    * two-phase search over a binary index (sign bits approximate
    * cosine: for unit-ish vectors `cos ≈ cos(π·hamming/d)`, so small
    * Hamming ⇒ high cosine, and the rerank repairs the
    * quantization's ranking noise).
    *
    * The 100 TB split this encodes: phase 1 scans ONLY the packed
    * words (d/8 bytes per vector — a 1000-executor sweep over what
    * would be a 32x larger float scan), ranked by the bounded
    * [[graft.functions.TopKBy]] aggregate (never a corpus-wide window
    * sort); phase 2 fetches full vectors for `|queries|·mult·k` rows
    * alone — broadcast-joined, the float corpus is touched pointwise.
    * Ties break (hamming, vec_id) then (cos_sim, vec_id): exact
    * integers and a 6dp-rounded single division, bit-stable across
    * engines and partitionings. */
  def binaryHammingTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                        mult: Int = 3): DataFrame = {
    val words = embeddings.select(col("vec_id"),
      expr(signWordsExpr("embedding")).as("words"))
    val qw = words.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("words").as("qwords"))
    val cand = words.join(broadcast(qw), col("vec_id") =!= col("query_id"))
      .withColumn("hamming", expr(hammingExpr("words", "qwords")).cast("long"))
      .groupBy(col("query_id"))
      .agg(graft.functions.Native.topKBy(-col("hamming"), col("vec_id"), mult * k)
        .as("tk"))
      .select(col("query_id"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("p.payload").as("vec_id"),
        (-col("p.ord")).as("hamming"))
    val e = embeddings.withColumn("nv", norm(col("embedding")))
    val q = e.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nv").as("nq"))
    val rer = cand.join(e.select(col("vec_id"), col("embedding"), col("nv")),
        Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos_sim", round(cosineWithNorms(col("qe"), col("embedding"),
        col("nq"), col("nv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    rer.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("hamming"),
        col("cos_sim"))
  }

  /** Product-quantization ANN: encode the corpus as `m` sub-codes
    * (nearest strided-seed centroid per subspace, squared-L2), then
    * answer queries by asymmetric distance computation — a per-query
    * lookup table of (subspace, centroid) partial distances, summed
    * over the stored codes. The PQ trade at 100 TB: the corpus is
    * touched only through its `m`-byte codes (here `m` smallints) —
    * the ADC search never reads a float vector, so the scan is
    * codes-sized, ~32x smaller than the float corpus; encode is the
    * one N×K×m pass and is write-once (persist `codes` like
    * [[writeIvfIndex]] does cells).
    *
    * Determinism across engines: elements round to 6dp; each
    * subspace distance is a FIXED-ORDER sequential fold (`aggregate`
    * / DuckDB `list_sum`, same left-to-right order), rounded to 6dp
    * and scaled to integer micro-units (`floor(x·1e6 + 0.5)` — both
    * engines floor the same double); the ADC sum is then an INTEGER
    * sum — order-free — and ranking compares (long, vec_id): bit-
    * reproducible under any partitioning. Top-k rides the bounded
    * [[graft.functions.TopKBy]] aggregate, not a window sort.
    *
    * Codebook = subspace slices of every `centStride`-th vector (the
    * same deterministic seeding as [[ivfAssign]]); production PQ
    * trains 256 centroids/subspace with k-means
    * ([[kmeansAssign]] is the trainer shape) — the plan is identical,
    * only the codebook content changes. */
  def pqTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
             m: Int = 8, centStride: Long = 100): DataFrame = {
    val (e, cents, sub) = pqParts(embeddings, m, centStride)
    val codes = pqCodeRows(e, cents, m, sub)
    val dtable = pqDistTable(e, cents, queryIds, m, sub)
    pqRank(codes.join(broadcast(dtable), Seq("sub", "cent_id"))
      .filter(col("vec_id") =!= col("query_id")), k)
  }

  /** Shared PQ setup: 6dp-rounded vectors, the strided codebook, and
    * the subspace length — one definition for [[pqTopK]] and the
    * composed [[writeIvfPqIndex]]/[[ivfPqTopK]], so the two paths can
    * never drift in rounding or seeding. */
  private def pqParts(embeddings: DataFrame, m: Int,
                      centStride: Long): (DataFrame, DataFrame, Int) = {
    require(m >= 1, s"m ($m) must be >= 1")
    // metadata-scale collect: one row, the dimensionality
    val d = embeddings.select(size(col("embedding")).as("d")).head().getInt(0)
    require(d % m == 0, s"dim $d must divide into m=$m subspaces")
    val e = embeddings.select(col("vec_id"),
      expr("transform(embedding, x -> round(CAST(x AS DOUBLE), 6))").as("v"))
    val cents = e.filter(col("vec_id") % centStride === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    (e, cents, d / m)
  }

  /** Squared-L2 of one subspace slice in integer micro-units (native
    * codegen'd fold — bit-identical to the HOF form, see SquaredL2);
    * reads the enclosing frame's `sub` column. */
  private def pqDUs(subLen: Int)(a: Column, b: Column): Column = {
    val sa = slice(a, col("sub") * subLen + 1, lit(subLen))
    val sb = slice(b, col("sub") * subLen + 1, lit(subLen))
    floor(round(graft.functions.Native.squaredL2(sa, sb), 6) * 1e6 + 0.5)
      .cast("long")
  }

  /** PQ encode: (vec_id, sub, cent_id) — each vector's nearest
    * codebook entry per subspace, ties to the lower cent_id. */
  private def pqCodeRows(e: DataFrame, cents: DataFrame, m: Int,
                         subLen: Int): DataFrame =
    e.select(col("vec_id"), col("v"), explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .join(broadcast(cents))
      .withColumn("d_us", pqDUs(subLen)(col("v"), col("cv")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("cent_id"), struct(col("d_us"), col("cent_id")))
        .as("cent_id"))

  /** Per-query ADC lookup table: (query_id, sub, cent_id, d_us). */
  private def pqDistTable(e: DataFrame, cents: DataFrame, queryIds: Seq[Long],
                          m: Int, subLen: Int): DataFrame =
    e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .join(broadcast(cents))
      .select(col("query_id"), col("sub"), col("cent_id"),
        pqDUs(subLen)(col("qv"), col("cv")).as("d_us"))

  /** Integer ADC sum + bounded top-k: (query_id, rank, vec_id,
    * approx_dist) from (query_id, vec_id, d_us) partials. */
  private def pqRank(partials: DataFrame, k: Int): DataFrame =
    partials
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d_us")).as("approx_us"))
      .groupBy(col("query_id"))
      .agg(graft.functions.Native.topKBy(-col("approx_us"), col("vec_id"), k)
        .as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("p.payload").as("vec_id"),
        ((-col("p.ord")).cast("double") / 1e6).as("approx_dist"))
      .orderBy("query_id", "rank")

  /** Persist the composed IVF-PQ index — the actual 100 TB ANN serving
    * layout: each vector stored as its IVF cell (coarse quantizer,
    * [[ivfAssign]]) plus its `m` PQ sub-codes, bucketed by `cent_id`.
    * NO float vector survives into the table: the at-rest footprint is
    * (vec_id, cent_id, m codes) per vector — ~32x smaller than the
    * float corpus — and a search reads only the probed buckets of it.
    * The codebook is re-derivable from the (tiny, strided) centroid
    * set, so it is not persisted. */
  def writeIvfPqIndex(embeddings: DataFrame, table: String, nBuckets: Int,
                      centStride: Long = 100, m: Int = 8): Unit = {
    val (e, cents, sub) = pqParts(embeddings, m, centStride)
    val codes = pqCodeRows(e, cents, m, sub)
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("cent_id")))).as("sc"))
      .select(col("vec_id"), expr("transform(sc, p -> p.cent_id)").as("codes"))
    val cells = ivfAssign(embeddings, centStride)
      .select(col("vec_id"), col("cent_id"))
    graft.operators.Bucketing.writeBucketed(
      codes.join(cells, Seq("vec_id")), table, "cent_id", nBuckets)
  }

  /** Search a [[writeIvfPqIndex]] table: resolve the probe cells on
    * the driver (|queries| x nprobe rows, scalar by contract) so the
    * index scan is a LITERAL `IN` over `cent_id` — bucket-pruned at
    * planning, like [[ivfTopKIndexed]] — then score candidates by
    * asymmetric distance over the stored codes alone. The scan reads
    * codes, never a float vector (none exists in the table); the only
    * per-candidate work is m lookups into the broadcast distance
    * table and an integer sum. Coarse-prune recall x PQ-approximation
    * accuracy compose here; evaluate against [[cosineTopK]] with the
    * q90 recall harness. */
  def ivfPqTopK(spark: SparkSession, table: String, embeddings: DataFrame,
                queryIds: Seq[Long], k: Int, nprobe: Int = 2,
                centStride: Long = 100, m: Int = 8): DataFrame = {
    // staleness defense: the stored codes must describe THIS corpus
    IndexStamp.verify(spark, table, embeddings, "ivfPqTopK")
    val (e, cents, sub) = pqParts(embeddings, m, centStride)
    val dtable = pqDistTable(e, cents, queryIds, m, sub)
      .withColumnRenamed("cent_id", "code")
    val probes = probeSet(embeddings, queryIds, nprobe, centStride)
      .select(col("query_id"), col("cent_id"))
    val probeRows = probes.collect().toSeq
    val cells = probeRows.map(_.getAs[Long]("cent_id")).distinct
    val probePairs = spark.createDataFrame(
      spark.sparkContext.parallelize(probeRows, 1), probes.schema)
    spark.table(table).filter(col("cent_id").isInCollection(cells))
      .join(broadcast(probePairs), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(dtable), Seq("query_id", "sub", "code"))
      .transform(pqRank(_, k))
  }

  /** Persist the IVF index as a `cent_id`-bucketed (and sorted) catalog
    * table. Bucketing puts each cell's members in known files at rest,
    * so an indexed search ([[ivfTopKIndexed]]) reads ONLY the probed
    * buckets — at 100 TB the probe touches nprobe cells' worth of
    * data, not the corpus. Pick `nBuckets` ~2-4x cluster cores. */
  def writeIvfIndex(embeddings: DataFrame, table: String, nBuckets: Int,
                    centStride: Long = 100): Unit = {
    val assigned = ivfAssign(embeddings, centStride)
      .withColumn("nv", norm(col("embedding")))
    graft.operators.Bucketing.writeBucketed(assigned, table, "cent_id", nBuckets)
  }

  /** IVF ANN over a [[writeIvfIndex]] table. The probe set (query x
    * nprobe cells) is resolved ON THE DRIVER — it is |queries|*nprobe
    * rows, scalar by contract — so the cell filter is a LITERAL `IN`
    * predicate the scan can bucket-prune, and the probe join is a
    * broadcast hash join with NO shuffle on the index side. This is
    * the 100 TB read path: open nprobe buckets, skip the rest. */
  def ivfTopKIndexed(spark: SparkSession, table: String,
                     embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                     nprobe: Int = 2, centStride: Long = 100): DataFrame = {
    // staleness defense: the bucketed cells must describe THIS corpus
    IndexStamp.verify(spark, table, embeddings, "ivfTopKIndexed")
    val probes = probeSet(embeddings, queryIds, nprobe, centStride)
    // one computation of the (scalar-sized) probe set, reused both as
    // the literal pruning predicate and as the broadcast join side
    val probeRows = probes.collect().toSeq
    val cells = probeRows.map(_.getAs[Long]("cent_id")).distinct
    val probesLocal = spark.createDataFrame(
      spark.sparkContext.parallelize(probeRows, 1), probes.schema)
    val assigned = spark.table(table).filter(col("cent_id").isInCollection(cells))
    searchCells(assigned, probesLocal, k)
  }

  /** Distributed Lloyd's k-means over the embedding corpus — the
    * training pass [[ivfAssign]]'s stride centroids skip: `iters`
    * assignment rounds with a centroid update between each, returning
    * the final (vec_id, cent_id, cent_sim) assignment.
    *
    * Engine-portable determinism, the hard part of distributed
    * k-means, comes from three choices:
    *   - init is the deterministic stride sample (every `centStride`-th
    *     vector), no RNG;
    *   - components are rounded to 6 dp once up front, and centroid
    *     updates are component sums in DECIMAL(18,6) — exact, so the
    *     result cannot depend on Spark's partition-order float
    *     summation (the classic irreproducibility of distributed
    *     k-means);
    *   - centroids stay UNNORMALIZED sums, never divided by the
    *     cluster size: cosine is scale-invariant, so sum and mean
    *     assign identically and the division (whose decimal precision
    *     rules differ across engines) never happens.
    *
    * Shape per iteration: assignment is a broadcast join + one
    * partial-aggregable max_by groupBy (no per-vector sort); the
    * update is one posexplode + (cent_id, pos) sum — rows = corpus x
    * dims, the unavoidable k-means volume, shuffled as compact
    * numeric triples, never the text. `materialize` is the same scale
    * hook as [[Dedup.dedupCorpus]]'s: the corpus slice feeds every
    * iteration, so pass `_.localCheckpoint()` to scan it once. */
  def kmeansAssign(embeddings: DataFrame, iters: Int = 2,
                   centStride: Long = 100,
                   materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be at least 1")
    val e = materialize(embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> round(CAST(x AS DOUBLE), 6))").as("v"))
      .withColumn("nv", norm(col("v"))))

    def assignTo(cents: DataFrame): DataFrame =
      e.join(broadcast(cents))
        .withColumn("cent_sim", round(cosineWithNorms(col("v"), col("ce"),
          col("nv"), col("nc")), 6))
        .groupBy(col("vec_id"))
        .agg(max_by(
          struct(col("v"), col("cent_id"), col("cent_sim")),
          struct(col("cent_sim"), (-col("cent_id")).as("tie"))).as("best"))
        .select(col("vec_id"), col("best.v").as("v"),
          col("best.cent_id").as("cent_id"), col("best.cent_sim").as("cent_sim"))

    var cents = e.filter(col("vec_id") % centStride === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("ce"), col("nv").as("nc"))
    var assigned = assignTo(cents)
    for (_ <- 2 to iters) {
      cents = assigned
        .select(col("cent_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(sum(col("x").cast("decimal(18,6)")).as("s"))
        .groupBy(col("cent_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
        .select(col("cent_id"),
          expr("transform(ps, p -> CAST(p.s AS DOUBLE))").as("ce"))
        .withColumn("nc", norm(col("ce")))
      assigned = assignTo(cents)
    }
    assigned.select(col("vec_id"), col("cent_id"), col("cent_sim"))
  }
}
