package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class NgramPcaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------ NgramLm

  test("bigrams: adjacent pairs only, one-word docs contribute nothing") {
    val docs = Seq((1L, "a b c"), (2L, "x"), (3L, "p q")).toDF("doc_id", "text")
    val got = NgramLm.bigrams(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(got === Seq((1L, "a", "b"), (1L, "b", "c"), (3L, "p", "q")))
  }

  test("lm scoring: hand-computed Laplace integers on a tiny corpus") {
    // train = docs 1,2 (doc_id % 10 != 0); held = doc 10
    val docs = Seq(
      (1L, "a b a b"), // bigrams: (a,b) (b,a) (a,b)
      (2L, "a b c"),   // (a,b) (b,c)
      (10L, "a b z"))  // held: (a,b) seen, (b,z) unseen
      .toDF("doc_id", "text")
    val rows = NgramLm.scoreHeldOut(docs).collect()
    assert(rows.length === 1)
    val r = rows(0)
    // train counts: c(a,b)=3, c(b,a)=1, c(b,c)=1; c(a,.)=3, c(b,.)=2; V=3
    // (a,b): (1e9 * 4) div (3 + 3) = 666666666
    // (b,z): (1e9 * 1) div (2 + 3) = 200000000
    assert(r.getAs[Long]("n_bigrams") === 2L)
    assert(r.getAs[Long]("unseen_bigrams") === 1L)
    assert(r.getAs[Double]("mean_scaled_p") ===
      (666666666L + 200000000L).toDouble / 2.0)
  }

  test("lm scoring: partitioning-invariant (exact integer path)") {
    val docs = (0L until 60L)
      .map(i => (i, s"w${i % 5} w${(i + 1) % 5} w${(i + 2) % 5} w${i % 3}"))
      .toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("unseen_bigrams"), r.getAs[Double]("mean_scaled_p"))
    val a = NgramLm.scoreHeldOut(docs).collect().map(key).toSeq
    val b = NgramLm.scoreHeldOut(docs.repartition(13)).collect().map(key).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("pmi: perfectly-associated pair outranks independent pairs") {
    // "q r" always co-occur; the filler pairs (x_k, y_m) spread over
    // 35 combinations so no filler bigram reaches min support, and
    // (r, x_k)/(r, q) carry a diluted left margin.
    val docs = (0L until 40L).map { i =>
      (i, s"q r q r x${i % 5} y${(i * 3) % 7}")
    }.toDF("doc_id", "text")
    val got = NgramLm.pmiCollocations(docs, minCount = 5, topN = 3).collect()
    assert(got.nonEmpty)
    val top = got(0)
    assert(top.getAs[String]("a") === "q" && top.getAs[String]("b") === "r")
    // exact-ratio check: score = N*c_ab/(c_a*c_b) from integer counts
    val n = got(0).getAs[Long]("c_a") // placeholder to silence unused warn
    assert(n > 0)
    got.foreach { r =>
      val expect = r.getAs[Long]("c_ab").toDouble *
        NgramLm.bigrams(docs).count().toDouble /
        (r.getAs[Long]("c_a").toDouble * r.getAs[Long]("c_b").toDouble)
      assert(r.getAs[Double]("pmi_ratio") === expect)
    }
  }

  // ------------------------------------------------------------ Pca

  private def randVecs(n: Int, d: Int, seed: Long): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Array.fill(d)((rnd.nextGaussian() * 0.3).toFloat))
  }

  test("gram cells: match a naive driver-side computation exactly") {
    val d = 5
    val vecs = randVecs(40, d, seed = 7L)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = Pca.gramCells(df, "embedding", d).collect()
    assert(got.length === d * (d + 1) / 2)
    val micro = vecs.map(_.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
    got.foreach { r =>
      val i = r.getAs[Int]("i") - 1; val j = r.getAs[Int]("j") - 1
      assert(r.getAs[Long]("n") === 40L)
      val g = micro.map(m => m(i) * m(j)).sum
      assert(r.getAs[Long]("gram_micro") === g, s"cell ($i,$j)")
      val si = micro.map(_(i)).sum; val sj = micro.map(_(j)).sum
      val cov = (g.toDouble / 40.0 -
        (si.toDouble / 40.0) * (sj.toDouble / 40.0)) / 1e12
      assert(r.getAs[Double]("cov") === cov)
    }
  }

  test("gram cells: bit-identical under repartitioning (exact merge)") {
    val df = randVecs(60, 8, seed = 11L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Int]("i"),
      r.getAs[Int]("j"), r.getAs[Long]("gram_micro"), r.getAs[Double]("cov"))
    val a = Pca.gramCells(df, "embedding", 8).collect().map(key).toSeq
    val b = Pca.gramCells(df.repartition(17), "embedding", 8)
      .collect().map(key).toSeq
    assert(a === b)
  }

  test("mergeCells: prev + delta == gramCells over the concatenation, bit-exact") {
    val a = randVecs(35, 6, seed = 23L)
    val b = randVecs(25, 6, seed = 29L)
    def df(vs: Seq[Array[Float]], off: Int) = vs.zipWithIndex
      .map { case (v, i) => ((i + off).toLong, v) }.toDF("vec_id", "embedding")
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Int]("i"),
      r.getAs[Int]("j"), r.getAs[Long]("n"), r.getAs[Long]("gram_micro"),
      r.getAs[Long]("s_i"), r.getAs[Long]("s_j"), r.getAs[Double]("cov"))
    val merged = Pca.mergeCells(
      Pca.gramCells(df(a, 0), "embedding", 6),
      Pca.gramCells(df(b, 1000), "embedding", 6)).collect().map(key).toSeq
    val full = Pca.gramCells(df(a ++ b, 0), "embedding", 6)
      .collect().map(key).toSeq
    // vec ids differ between the two paths but moments must not
    assert(merged === full)
  }

  test("standardize: z-scores match hand-computed moments; zero mean, unit sd") {
    val vecs = randVecs(80, 3, seed = 31L)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val rows = Pca.standardize(df, "vec_id", "embedding", 3).collect()
    val micro = vecs.map(_.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
    val n = vecs.length.toDouble
    (0 until 3).foreach { d =>
      val mean = micro.map(_(d)).sum.toDouble / n / 1e6
      val sd = math.sqrt((micro.map(m => m(d) * m(d)).sum.toDouble / n
        - (micro.map(_(d)).sum.toDouble / n) * (micro.map(_(d)).sum.toDouble / n)) / 1e12)
      val zs = rows.map(r =>
        (r.getAs[Long]("vec_id"), r.getSeq[Double](1)(d))).toMap
      vecs.indices.foreach { i =>
        val expect = (micro(i)(d).toDouble / 1e6 - mean) / sd
        assert(zs(i.toLong) === expect, s"vec $i dim $d")
      }
      // the standardized column has ~zero mean and ~unit variance
      val all = zs.values.toSeq
      assert(math.abs(all.sum / n) < 1e-9)
      assert(math.abs(all.map(z => z * z).sum / n - 1.0) < 1e-6)
    }
  }

  test("gram guards: NaN coordinate and merged-moment overflow both fail fast") {
    val bad = Seq((1L, Array(1.0f, Float.NaN))).toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      Pca.gramCells(bad, "embedding", 2).collect()
    }
    assert(e1.getMessage != null)
    // two legal per-batch cells whose merged gram_micro exceeds BIGINT
    val near = Seq((1, 1, 5L, 6000000000000000000L, 10L, 10L, 0.0))
      .toDF("i", "j", "n", "gram_micro", "s_i", "s_j", "cov")
    val e2 = intercept[Exception] {
      Pca.mergeCells(near, near).collect()
    }
    assert(e2.getMessage.contains("mergeCells") ||
      e2.getCause != null, e2.getMessage)
  }

  test("eigen: recovers the dominant axis of an anisotropic cloud") {
    val rnd = new scala.util.Random(3L)
    // variance 9 along axis 0, ~0.01 elsewhere; mean offset to exercise
    // centering
    val vecs = Seq.fill(300)(Array.tabulate(6)(k =>
      if (k == 0) (rnd.nextGaussian() * 3.0 + 5.0).toFloat
      else (rnd.nextGaussian() * 0.1).toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val cells = Pca.gramCells(df, "embedding", 6)
    val cov = Pca.covMatrix(cells, 6)
    val comps = Pca.principalComponents(cov, 2)
    assert(comps.length === 2)
    val (l1, v1) = comps(0)
    assert(l1 > comps(1)._1)
    assert(math.abs(v1(0)) > 0.99,   // dominant direction ≈ e0
      s"pc1 = ${v1.mkString(",")}")
    assert(v1(0) > 0)                // sign convention: max component > 0
    // eigen residual: ||C v - l v||_inf small relative to l
    val res = (0 until 6).map { r =>
      val av = (0 until 6).map(c => cov(r)(c) * v1(c)).sum
      math.abs(av - l1 * v1(r))
    }.max
    assert(res < 1e-9 * math.max(1.0, l1), s"residual $res")
  }

  test("whitening: unit variance per component, decorrelated, degenerate axes dropped") {
    val rnd = new scala.util.Random(41L)
    // strong anisotropy + one exactly-constant (zero variance) axis
    val vecs = Seq.fill(300)(Array.tabulate(5)(k =>
      if (k == 4) 2.5f
      else (rnd.nextGaussian() * (k + 1.0)).toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val cells = Pca.gramCells(df, "embedding", 5)
    val cov = Pca.covMatrix(cells, 5)
    val comps = Pca.principalComponents(cov, 5)
    val micro = vecs.map(_.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
    val n = vecs.length.toDouble
    val means = (0 until 5).map(i => micro.map(_(i)).sum / n / 1e6).toArray
    val out = Pca.whiten(df, "vec_id", "embedding", means, comps).collect()
    // the constant axis (eigenvalue ~0) is dropped: 4 components remain
    assert(out(0).schema.fieldNames.count(_.startsWith("pc")) === 4)
    def stats(c: String) = {
      val xs = out.map(_.getAs[Double](c))
      val mu = xs.sum / xs.length
      (mu, xs.map(x => (x - mu) * (x - mu)).sum / xs.length)
    }
    (1 to 4).foreach { k =>
      val (mu, v) = stats(s"pc$k")
      assert(math.abs(mu) < 1e-6, s"pc$k mean $mu")
      assert(math.abs(v - 1.0) < 1e-6, s"pc$k variance $v")
    }
    // decorrelated: |corr(pc1, pc2)| ~ 0
    val a = out.map(_.getAs[Double]("pc1")); val b2 = out.map(_.getAs[Double]("pc2"))
    val corr = a.zip(b2).map { case (x, y) => x * y }.sum / a.length
    assert(math.abs(corr) < 1e-6, s"corr $corr")
  }

  test("projection: pc1 carries more variance than pc2, centered") {
    val rnd = new scala.util.Random(19L)
    val vecs = Seq.fill(200)(Array.tabulate(4)(k =>
      (rnd.nextGaussian() * (4 - k)).toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val cells = Pca.gramCells(df, "embedding", 4)
    val cov = Pca.covMatrix(cells, 4)
    val n = vecs.length.toDouble
    val micro = vecs.map(_.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
    val means = (0 until 4).map(i => micro.map(_(i)).sum / n / 1e6).toArray
    val comps = Pca.principalComponents(cov, 2)
    val proj = Pca.project(df, "vec_id", "embedding", means,
      comps.map(_._2)).collect()
    assert(proj.length === 200)
    def variance(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    val v1 = variance(proj.map(_.getAs[Double]("pc1")).toSeq)
    val v2 = variance(proj.map(_.getAs[Double]("pc2")).toSeq)
    assert(v1 > v2)
    // projection variance along pc_k ≈ eigenvalue_k
    assert(math.abs(v1 - comps(0)._1) / comps(0)._1 < 0.05)
  }
}
