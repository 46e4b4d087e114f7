package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  /** cosine(a, b) as a fold in index order (deterministic). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Exact top-k cosine neighbors for each query vector (queries =
    * rows of `embeddings` whose vec_id is in `queryIds`). */
  def cosineTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val q = embeddings
      .filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = embeddings.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(cosine(col("qe"), col("embedding")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos_sim"))
  }

  /** Deterministic hyperplane component for (plane, dim): ±1 from one
    * md5 hex digit. Same formula is expressible in any engine with md5. */
  private def planeComponent(plane: Int, dim: Int): Column =
    when(expr(s"substr(md5('$plane|$dim'), 1, 1)") < "8", lit(-1.0)).otherwise(lit(1.0))

  /** Assign each vector an LSH bucket: bit i = sign of dot(v, plane_i). */
  def lshBuckets(embeddings: DataFrame, nPlanes: Int = 8): DataFrame = {
    val bits = (0 until nPlanes).map { p =>
      val dotP = aggregate(
        zip_with(col("embedding"),
                 expr(s"transform(sequence(0, size(embedding) - 1), " +
                      s"j -> CASE WHEN substr(md5('$p|' || j), 1, 1) < '8' THEN -1.0 ELSE 1.0 END)"),
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
    val all = lshBuckets(embeddings, nPlanes)
    val q = all.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val scored = all.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(cosine(col("qe"), col("embedding")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos_sim"))
  }
}
