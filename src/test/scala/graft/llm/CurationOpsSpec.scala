package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Operator-level invariants for the round-7 curation tier — the
  * cross-engine value parity is q155–q161's oracle job; these pin the
  * semantic contracts the oracle can't express as neatly. */
class CurationOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  private def docs = graft.core.Tables.load(spark, dir, "documents")
  private def emb = graft.core.Tables.load(spark, dir, "embeddings")

  test("chunkDedup: a doc with no shared chunks reassembles to itself") {
    val out = CurationOps.chunkDedup(docs, w = 16)
      .join(docs.select(col("doc_id"), md5(col("text")).as("orig_md5")), "doc_id")
    val untouched = out.filter(col("n_dropped") === 0)
    assert(untouched.count() > 0, "fixture should contain unique docs")
    assert(untouched.filter(col("clean_md5") =!= col("orig_md5")).count() == 0,
      "reassembly of fully-kept chunks must reproduce the original text")
  }

  test("chunkDedup: planted cross-doc duplicate chunk is dropped from both") {
    val shared = (1 to 16).map(i => s"tok$i").mkString(" ")
    val d = Seq(
      (1L, s"$shared alpha beta gamma delta"),
      (2L, s"$shared epsilon zeta eta theta"),
      (3L, "entirely unrelated words only here")).toDF("doc_id", "text")
    val out = CurationOps.chunkDedup(d, w = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 1L && out(2L) == 1L, "the shared 16-word chunk drops")
    assert(out(3L) == 0L, "the unique doc keeps everything")
  }

  test("semDedup: every cluster keeps its minimum vec_id") {
    val out = CurationOps.semDedup(emb, tau = 0.35, centStride = 100)
    val minKept = out.groupBy("cent_id")
      .agg(min("vec_id").as("min_id"))
      .join(out, col("min_id") === out("vec_id"))
      .filter(col("dropped"))
    assert(minKept.count() == 0, "the lowest id of a cluster has no lower-id neighbor, so it can never drop")
  }

  test("semDedup: dropped vectors really have a lower-id close neighbor in-cluster") {
    val out = CurationOps.semDedup(emb, tau = 0.35, centStride = 100)
    val withVec = out.join(emb, "vec_id")
      .withColumn("nv", Similarity.norm(col("embedding")))
    val witness = withVec.alias("d").filter(col("d.dropped"))
      .join(withVec.alias("o"), col("o.cent_id") === col("d.cent_id") &&
        col("o.vec_id") < col("d.vec_id"))
      .filter(round(Similarity.cosineWithNorms(col("d.embedding"),
        col("o.embedding"), col("d.nv"), col("o.nv")), 6) >= 0.35)
      .select(col("d.vec_id")).distinct()
    val dropped = out.filter(col("dropped")).select("vec_id")
    assert(dropped.exceptAll(witness).isEmpty,
      "every dropped vector needs a witness neighbor")
  }

  test("dsirWeights: target-typical text outscores off-target text") {
    // two 'en' docs establish the target bucket mass; the scored pair
    // shares length, so only bucket alignment separates them
    val d = Seq(
      (1L, "en", "the cat sat on the mat " * 20),
      (2L, "en", "the dog ran in the park " * 20),
      (3L, "en", "the cat sat on the mat " * 20),
      (4L, "xx", "zzq qqz zqq qzz zzz qqq " * 20)
    ).toDF("doc_id", "lang", "text")
    val scores = CurationOps.dsirWeights(d, targetLang = "en", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(3L) > scores(4L),
      "a doc built from target-language bigrams must outweigh an off-target doc")
  }

  test("clusterRepresentatives: the representative has the cluster's max quality") {
    val clusters = Seq((10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L), (21L, 20L))
      .toDF("id", "component")
    val quality = Seq((10L, 1.0), (11L, 3.0), (12L, 2.0), (20L, 5.0), (21L, 5.0))
      .toDF("doc_id", "quality_score")
    val reps = CurationOps.clusterRepresentatives(clusters, quality)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(reps == Set((10L, 3L, 11L), (20L, 2L, 20L)),
      "argmax by quality, ties to the lowest doc_id")
  }

  test("curriculumOrder: decile boundaries are monotone in quality") {
    val d = docs
    val quality = d.select(col("doc_id"), col("source"))
      .join(CorpusOps.qualityScore(d).select("doc_id", "quality_score"), "doc_id")
    val out = CurationOps.curriculumOrder(quality).join(quality, Seq("doc_id", "source"))
    val bounds = out.groupBy("decile")
      .agg(min("quality_score").as("lo"), max("quality_score").as("hi"))
      .orderBy("decile").collect()
    bounds.sliding(2).foreach { case Array(hiD, loD) =>
      assert(hiD.getDouble(1) >= loD.getDouble(2),
        s"decile ${hiD.getInt(0)} min must be >= decile ${loD.getInt(0)} max")
    }
    // round-robin index is dense per (decile, source)
    val dense = out.groupBy("decile", "source")
      .agg(count(lit(1)).as("n"), max("rr").as("mx"))
      .filter(col("n") =!= col("mx"))
    assert(dense.count() == 0)
  }

  test("cdcChunkDedup: content-defined boundaries survive a prefix shift that breaks fixed chunks") {
    // deterministic text of effectively-unique tokens (a small-modulus
    // sequence is PERIODIC and lets shifted fixed chunks collide);
    // doc 2 = one-word prefix + same text
    val base = (1 to 300).map(i => s"t${i * 2654435761L % 100003}").mkString(" ")
    val d = Seq((1L, base), (2L, s"shift $base")).toDF("doc_id", "text")
    val cdc = CurationOps.cdcChunkDedup(d, divisor = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fixed = CurationOps.chunkDedup(d, w = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cdc(1L) > 0 && cdc(2L) > 0,
      "CDC re-synchronizes after the insertion, so shared segments are found")
    assert(fixed(1L) == 0 && fixed(2L) == 0,
      "fixed 16-word chunks all mis-align after a 1-word shift (the failure CDC fixes)")
  }

  test("cdcChunkDedup: a doc with no shared segments reassembles to itself") {
    val out = CurationOps.cdcChunkDedup(docs, divisor = 16)
      .join(docs.select(col("doc_id"), md5(col("text")).as("orig_md5")), "doc_id")
      .filter(col("n_dropped") === 0)
    assert(out.count() > 0)
    assert(out.filter(col("clean_md5") =!= col("orig_md5")).count() == 0)
  }

  test("sourceOverlap: containment is directional") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (1L, "small", a),
      (2L, "big", s"$a iota kappa lambda mu nu xi omicron pi rho")
    ).toDF("doc_id", "source", "text")
    val out = CurationOps.sourceOverlap(d, n = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("small", "big")) == 1.0,
      "every gram of the contained source occurs in the aggregator")
    assert(out(("big", "small")) < 1.0,
      "the aggregator has grams the small source lacks")
  }

  test("dedupAgainstIndex: an indexed clone is flagged with full agreement; novel text is admitted") {
    val cloned = (1 to 40).map(i => s"c${i * 31 % 101}").mkString(" ")
    val novel = (1 to 40).map(i => s"z${i * 17 % 103}").mkString(" ")
    val corpus = Seq((10L, cloned), (11L, "other indexed words entirely"))
      .toDF("doc_id", "text")
    val batch = Seq((20L, cloned), (21L, novel)).toDF("doc_id", "text")
    Dedup.writeLshIndex(corpus, "graft_lsh_test", k = 8, bands = 4, shingle = 3)
    val out = Dedup.dedupAgainstIndex(spark, "graft_lsh_test", batch,
        k = 8, bands = 4, shingle = 3, minAgree = 4)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(5), r.getLong(2), r.getLong(3))).toMap
    assert(out(20L) == ((true, 10L, 8L)),
      "a verbatim clone of an indexed doc agrees on all 8 minhash components")
    assert(out(21L)._1 == false, "novel text collides with nothing")
  }

  test("curationFunnel: stage counts are monotone and bounded by n_docs") {
    val d = docs
    val out = CurationOps.curationFunnel(
      d.filter(col("doc_id") % 50 =!= 0), d.filter(col("doc_id") % 50 === 0))
    val bad = out.filter(col("n_quality") > col("n_docs") ||
      col("n_unique") > col("n_quality") || col("n_clean") > col("n_unique") ||
      col("n_clean") < 0)
    assert(bad.count() == 0, "funnel stages can only shrink")
    assert(out.count() > 0)
  }

  test("leakageFreeSplit: every near-dup cluster lands in exactly one split") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("id", "component")
    val d = (1L to 10L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val out = CurationOps.leakageFreeSplit(d, clusters)
    val perCluster = out.join(clusters, out("doc_id") === clusters("id"))
      .groupBy("component").agg(countDistinct("split").as("n"))
      .filter(col("n") > 1)
    assert(perCluster.count() == 0, "a cluster split across train/eval leaks")
    // unclustered docs fall back to the plain per-doc hash split
    val solo = out.filter(!col("doc_id").isin(1L, 2L, 3L, 7L, 8L))
    assert(solo.filter(col("rep") =!= col("doc_id")).count() == 0)
    assert(out.count() == 10)
  }

  test("ngramNovelty: novelty is a fraction, and a train-copied doc scores zero") {
    val copiedFromTrain = "alpha beta gamma delta epsilon zeta eta theta iota"
    // doc_id buckets: pick ids so one eval doc copies a train doc's text
    val ids = (0L until 400L)
    val bucket = (id: Long) => {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).take(3).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16) % 100
    }
    val evalId = ids.find(bucket(_) >= 96).get
    val trainId = ids.find(bucket(_) < 96).get
    val d = Seq(
      (trainId, copiedFromTrain),
      (evalId, copiedFromTrain)).toDF("doc_id", "text")
    val out = CurationOps.ngramNovelty(d, n = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(evalId) == 0.0, "an eval doc cloned from train has zero novelty")
    val corpus = CurationOps.ngramNovelty(docs, n = 5)
      .filter(col("novelty") < 0 || col("novelty") > 1)
    assert(corpus.count() == 0)
  }
}
