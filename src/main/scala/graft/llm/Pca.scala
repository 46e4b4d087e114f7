package graft.llm

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed principal-component analysis over an embedding column.
  *
  * The corpus-scale piece — the d×d second-moment (Gram) matrix — is
  * ONE pass with a constant-size aggregation buffer: a typed
  * [[Aggregator]] folds every vector's outer product into a packed
  * upper-triangle `Array[Long]`, partially aggregated map-side, so
  * the shuffle carries one ~d²/2 buffer per partition regardless of
  * row count (the 100 TB shape; d is model-sized, 64 here). The
  * eigen-decomposition then runs on the driver over the d×d result —
  * a matrix whose size is independent of the data — and projection
  * back over the corpus is a narrow per-row map with the components
  * broadcast as literals.
  *
  * Determinism contract (q93/q126's discipline): each float
  * coordinate is snapped ONCE to an exact integer micro-unit
  * `floor(x·1e6 + 0.5)` — pure IEEE ops every engine agrees on —
  * and all accumulation is exact BIGINT arithmetic, so the Gram
  * cells are bit-identical under any partitioning and any engine.
  * The covariance surfaced per cell performs its lossy double ops
  * in one pinned expression over those exact integers.
  */
object Pca {

  /** Packed upper-triangle outer-product accumulator.
    *
    * Buffer layout (`Array[Long]`): positions `[0, T)` hold
    * `sum(m_i·m_j)` for `i <= j` in row-major triangle order
    * (`T = d(d+1)/2`), `[T, T+d)` hold the coordinate sums `m_i`,
    * and `[T+d]` holds the row count — everything an (uncentered or
    * centered) covariance needs, in one exact buffer.
    *
    * Range envelope: the BIGINT contract holds while
    * `rows · (microScale · max|x|)² < 2⁶³` — at the default 1e6
    * scale and unit-magnitude embeddings that is ~9e6 rows per
    * AGGREGATED BATCH. Beyond it, every add is `Math.addExact`, so
    * overflow FAILS FAST (the DuckDB oracle errors on the same cast
    * — the engines can disagree silently only if one wraps). The
    * 100 TB path is per-shard [[gramCells]] batches within the
    * envelope folded through [[mergeCells]], or a coarser
    * `microScale` (1e3 buys 1e6× more rows; the snap stays a pure
    * function both engines compute identically). */
  final class GramAggregator(dim: Int, microScale: Long = 1000000L)
      extends Aggregator[Array[Float], Array[Long], Array[Long]] {
    private val tri = dim * (dim + 1) / 2

    override def zero: Array[Long] = new Array[Long](tri + dim + 1)

    override def reduce(buf: Array[Long], v: Array[Float]): Array[Long] = {
      require(v != null && v.length == dim,
        s"embedding dim ${if (v == null) "null" else v.length} != $dim")
      val m = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        // NaN/Inf would snap to 0/minmax SILENTLY here while the
        // DuckDB oracle errors on the same cast — fail fast instead
        require(java.lang.Float.isFinite(v(i)),
          s"non-finite embedding coordinate at dim $i: ${v(i)}")
        m(i) = math.floor(v(i).toDouble * microScale.toDouble + 0.5).toLong
        i += 1
      }
      var k = 0
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          buf(k) = Math.addExact(buf(k), Math.multiplyExact(m(i), m(j)))
          j += 1; k += 1
        }
        buf(tri + i) = Math.addExact(buf(tri + i), m(i))
        i += 1
      }
      buf(tri + dim) += 1L
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Exact Gram/covariance cells of `embCol` (arrays of float, all
    * length `dim`): one row per upper-triangle cell `(i, j)`,
    * 1-based, with the exact micro-unit moment sums and the centered
    * covariance `E[xy] − E[x]E[y]` (in original units: micro² = 1e12
    * divides once at the end). The one-row aggregate explodes against
    * a broadcast (dim²-bounded) index table — no collect. */
  def gramCells(items: DataFrame, embCol: String, dim: Int,
                microScale: Long = 1000000L): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2
    val gram = udaf(new GramAggregator(dim, microScale),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    // linear triangle index k -> (i, j), both 1-based
    val idx = (for {
      i <- 0 until dim
      j <- i until dim
    } yield (i * dim - i * (i - 1) / 2 + (j - i), i + 1, j + 1))
      .toDF("k", "i", "j")
    items.agg(gram(col(embCol).cast("array<float>")).as("buf"))
      .select(posexplode(slice(col("buf"), 1, tri)).as(Seq("k", "gram_micro")),
        col("buf"))
      .join(broadcast(idx), Seq("k"))
      .select(col("i"), col("j"),
        element_at(col("buf"), tri + dim + 1).as("n"),
        col("gram_micro"),
        element_at(col("buf"), col("i") + lit(tri)).as("s_i"),
        element_at(col("buf"), col("j") + lit(tri)).as("s_j"))
      .select(col("i"), col("j"), col("n"), col("gram_micro"),
        col("s_i"), col("s_j"), covExpr(microScale).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  /** The ONE lossy expression of the whole pipeline, pinned so every
    * producer ([[gramCells]], [[mergeCells]]) and every engine
    * computes the identical doubles from the exact integer moments. */
  private def covExpr(microScale: Long): org.apache.spark.sql.Column =
    (col("gram_micro").cast("double") / col("n").cast("double")
      - (col("s_i").cast("double") / col("n").cast("double"))
        * (col("s_j").cast("double") / col("n").cast("double"))) /
      lit(microScale.toDouble * microScale.toDouble)

  /** Incremental maintenance: fold a new batch's cells into stored
    * cells by SUMMING the exact integer moments per `(i, j)` and
    * re-deriving `cov` with the same pinned expression — the result
    * is bit-identical to [[gramCells]] over the concatenated data
    * (the moments are sums; sums merge). A daily 100 TB embedding
    * refresh updates a d²/2-row table instead of re-scanning history. */
  def mergeCells(prev: DataFrame, delta: DataFrame,
                 microScale: Long = 1000000L): DataFrame = {
    val cols = ("i" +: "j" +: Seq("n", "gram_micro", "s_i", "s_j")).map(col)
    // sums ride DECIMAL(38,0) and fail fast on the way back to BIGINT:
    // the session runs non-ANSI, where a plain long sum() would WRAP
    // silently — the exact silent-disagreement the aggregator's
    // addExact closes (the oracle errors on the same overflow)
    def checked(name: String) =
      when(col(name) > lit(Long.MaxValue) || col(name) < lit(Long.MinValue),
        expr(s"raise_error('mergeCells: $name exceeds BIGINT — lower " +
          "microScale or merge smaller batches')"))
        .otherwise(col(name).cast("long")).as(name)
    prev.select(cols: _*)
      .unionByName(delta.select(cols: _*))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("n").cast("decimal(38,0)")).as("n"),
        sum(col("gram_micro").cast("decimal(38,0)")).as("gram_micro"),
        sum(col("s_i").cast("decimal(38,0)")).as("s_i"),
        sum(col("s_j").cast("decimal(38,0)")).as("s_j"))
      .select(col("i"), col("j"), checked("n"), checked("gram_micro"),
        checked("s_i"), checked("s_j"))
      .select(col("i"), col("j"), col("n"), col("gram_micro"),
        col("s_i"), col("s_j"), covExpr(microScale).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  /** Oracle twin of [[gramCells]] (DuckDB dialect). */
  def gramCellsSql(dim: Int, microScale: Long = 1000000L): String =
    s"""WITH m AS (
      |  SELECT list_transform(embedding,
      |    e -> CAST(floor(CAST(e AS DOUBLE) * $microScale + 0.5) AS BIGINT)) AS mv
      |  FROM embeddings),
      |idx AS (SELECT ii.g AS i, jj.g AS j
      |  FROM generate_series(1, $dim) ii(g), generate_series(1, $dim) jj(g)
      |  WHERE jj.g >= ii.g),
      |cells AS (
      |  SELECT idx.i AS i, idx.j AS j, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(mv[idx.i] * mv[idx.j]) AS BIGINT) AS gram_micro,
      |    CAST(SUM(mv[idx.i]) AS BIGINT) AS s_i,
      |    CAST(SUM(mv[idx.j]) AS BIGINT) AS s_j
      |  FROM m, idx GROUP BY idx.i, idx.j)
      |SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j, n, gram_micro,
      |  s_i, s_j,
      |  (CAST(gram_micro AS DOUBLE) / CAST(n AS DOUBLE)
      |   - (CAST(s_i AS DOUBLE) / CAST(n AS DOUBLE))
      |     * (CAST(s_j AS DOUBLE) / CAST(n AS DOUBLE)))
      |  / ${microScale * microScale}.0 AS cov
      |FROM cells ORDER BY i, j""".stripMargin

  /** Symmetric covariance matrix from [[gramCells]] output — a
    * d²-bounded (model-sized, data-independent) driver materialization
    * feeding the eigensolver. */
  def covMatrix(cells: DataFrame, dim: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](dim, dim)
    cells.select("i", "j", "cov").collect().foreach { r =>
      val i = r.getInt(0) - 1; val j = r.getInt(1) - 1
      val c = r.getDouble(2)
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  /** Top-`k` eigenpairs of a symmetric matrix by cyclic Jacobi
    * rotations — the right tool at d ≤ a few hundred (the matrix is
    * model-sized; the DATA never touches this code path). Returns
    * `(eigenvalue, eigenvector)` sorted by descending eigenvalue,
    * each vector sign-normalized so its largest-magnitude component
    * is positive (the conventional fix for the ±v ambiguity). */
  def principalComponents(a: Array[Array[Double]], k: Int)
      : Seq[(Double, Array[Double])] = {
    val d = a.length
    val m = Array.tabulate(d, d)((i, j) => a(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-14 && sweep < 100) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off += m(p)(q) * m(p)(q)
        if (math.abs(m(p)(q)) > 1e-18) {
          val theta = (m(q)(q) - m(p)(p)) / (2.0 * m(p)(q))
          val t =
            if (theta == 0.0) 1.0
            else math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          var i = 0
          while (i < d) {
            val mip = m(i)(p); val miq = m(i)(q)
            m(i)(p) = c * mip - s * miq
            m(i)(q) = s * mip + c * miq
            i += 1
          }
          i = 0
          while (i < d) {
            val mpi = m(p)(i); val mqi = m(q)(i)
            m(p)(i) = c * mpi - s * mqi
            m(q)(i) = s * mpi + c * mqi
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
            i += 1
          }
        }
      }
      sweep += 1
    }
    (0 until d).map { c =>
      val vec = Array.tabulate(d)(r => v(r)(c))
      val maxAbs = vec.indices.maxBy(i => math.abs(vec(i)))
      (m(c)(c), if (vec(maxAbs) < 0) vec.map(-_) else vec)
    }.sortBy(-_._1).take(k)
  }

  /** Per-dimension z-score standardization — the feature-scaling pass
    * every embedding pipeline runs before distance-based training.
    * One [[gramCells]] pass supplies the exact integer moments; the
    * diagonal (a dim-bounded MODEL parameter, fetched like centroids)
    * becomes literal mean/sd arrays; the rewrite itself is a narrow
    * per-row `zip_with` — no shuffle touches the corpus again.
    *
    * Every double op is pinned: `mean = (s/n)/1e6`,
    * `sd = sqrt(cov_ii)` (the [[covExpr]] diagonal), and
    * `z = (floor(x·1e6+0.5)/1e6 − mean)/sd` — identical IEEE
    * sequences in any engine, so standardized vectors are
    * bit-reproducible. Zero-variance dimensions yield ±Infinity/NaN
    * by IEEE division, faithfully in both engines. */
  /** Per-dimension means and standard deviations from a cells table —
    * the covariance-consistent model parameters [[project]] /
    * [[whiten]] / [[standardize]] center with. Driver-side but
    * dim-bounded (a model fetch, like centroids): `mean = (s/n)/scale`
    * and `sd = √cov_ii`, pinned in this order so the derived doubles
    * are identical everywhere. */
  def meansAndSds(cells: DataFrame, dim: Int,
                  microScale: Long = 1000000L): (Array[Double], Array[Double]) = {
    val diag = cells
      .filter(col("i") === col("j"))
      .select(col("i"), col("n"), col("s_i"), col("cov"))
      .collect().sortBy(_.getAs[Int]("i"))
    require(diag.length == dim, s"expected $dim diagonal cells, got ${diag.length}")
    val means = diag.map(r =>
      r.getAs[Long]("s_i").toDouble / r.getAs[Long]("n").toDouble /
        microScale.toDouble)
    val sds = diag.map(r => math.sqrt(r.getAs[Double]("cov")))
    (means, sds)
  }

  def standardize(items: DataFrame, idCol: String, embCol: String,
                  dim: Int): DataFrame = {
    val (means, sds) = meansAndSds(gramCells(items, embCol, dim), dim)
    val snapped = transform(col(embCol).cast("array<double>"),
      x => floor(x * lit(1e6) + lit(0.5)) / lit(1e6))
    items.select(col(idCol),
      zip_with(zip_with(snapped, lit(means), (v, mu) => v - mu),
        lit(sds), (d, s) => d / s).as("z"))
  }

  /** PCA whitening: project onto the top-`k` eigenvectors scaled by
    * `1/√λ`, so each output coordinate has (sample) unit variance and
    * the components are decorrelated — the standard conditioning step
    * before distance-based training on anisotropic embeddings. Same
    * narrow shape as [[project]] (the scaled components are literals);
    * eigenvalues ≤ `tol` are dropped rather than divided by (a
    * degenerate axis would amplify noise unboundedly). */
  def whiten(items: DataFrame, idCol: String, embCol: String,
             means: Array[Double], comps: Seq[(Double, Array[Double])],
             tol: Double = 1e-12): DataFrame = {
    val scaled = comps.filter(_._1 > tol).map { case (l, v) =>
      val s = 1.0 / math.sqrt(l)
      v.map(_ * s)
    }
    project(items, idCol, embCol, means, scaled)
  }

  /** Project every row's embedding onto `comps` (from
    * [[principalComponents]]): a narrow per-row map — components ride
    * into the plan as literal arrays (broadcast-by-construction),
    * output columns `pc1..pck`. Mean-centering uses the model's own
    * per-dimension means so projections are centered exactly like the
    * covariance was. */
  def project(items: DataFrame, idCol: String, embCol: String,
              means: Array[Double], comps: Seq[Array[Double]]): DataFrame = {
    val centered = zip_with(col(embCol).cast("array<double>"),
      lit(means), (x, mu) => x - mu)
    comps.zipWithIndex.foldLeft(
      items.select(col(idCol), centered.as("c0"))) { case (df, (w, i)) =>
        df.withColumn(s"pc${i + 1}",
          aggregate(zip_with(col("c0"), lit(w), (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x))
    }.drop("c0")
  }
}
