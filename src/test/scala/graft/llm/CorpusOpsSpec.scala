package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CorpusOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontaminate flags exactly the docs sharing an eval 5-gram") {
    val evalDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val train = Seq(
      // contains "the quick brown fox jumps" (and more) verbatim
      (1L, "prefix words the quick brown fox jumps over something", "en", "s"),
      // same words, different order: no shared 5-gram
      (2L, "fox brown quick the jumps dog lazy the over", "en", "s"),
      (3L, "completely unrelated text about spark catalyst plans", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.decontaminate(train, evalDocs, n = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L)._2 && got(1L)._1 === 2) // "the quick..jumps", "quick..jumps over"
    assert(got(2L) === ((0L, false)))
    assert(got(3L) === ((0L, false)))
  }

  test("decontaminate: short eval doc contaminates its exact duplicate only") {
    val evalDocs = Seq((9L, "tiny doc", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val train = Seq(
      (1L, "tiny doc", "en", "s"),            // whole-text gram matches
      (2L, "tiny doc extended with words", "en", "s")) // 5-grams differ
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.decontaminate(train, evalDocs, n = 5).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> false))
  }

  test("decontaminateBloom is bit-identical to the exact path, even at fpp=0.5") {
    // 200 train docs, 17 of them sharing a 5-gram with the eval set;
    // fpp=0.5 forces heavy bloom false positives so the exact verify
    // join must strip them for parity to hold.
    val evalDocs = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta", "en", "s"),
      (1001L, "one two three four five six seven", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val train = (0L until 200L).map { i =>
      val text =
        if (i % 12 == 0) s"noise $i alpha beta gamma delta epsilon trailing"
        else s"doc $i filler words nothing shared here at all ${i * 7}"
      (i, text, "en", "s")
    }.toDF("doc_id", "text", "lang", "source")
    val exact = CorpusOps.decontaminate(train, evalDocs, n = 5)
      .orderBy("doc_id").collect().toSeq
    val bloom = CorpusOps.decontaminateBloom(train, evalDocs, n = 5, fpp = 0.5)
      .orderBy("doc_id").collect().toSeq
    assert(bloom === exact)
    assert(exact.count(_.getBoolean(2)) === 17)
  }

  test("decontaminateBloom: clean corpus yields zero contamination") {
    val evalDocs = Seq((9L, "totally separate benchmark prompt text here", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val train = (0L until 50L)
      .map(i => (i, s"unrelated training document number $i with words", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.decontaminateBloom(train, evalDocs, n = 5, fpp = 0.01)
      .collect()
    assert(got.length === 50 && got.forall(!_.getBoolean(2)))
  }

  test("longestSharedSpans measures the exact longest common word span") {
    def words(prefix: String, k: Int): String =
      (0 until k).map(i => s"$prefix$i").mkString(" ")
    val shared = words("s", 15) // 15-word span shared verbatim
    val docsDf = Seq(
      (1L, s"${words("a", 5)} $shared ${words("z", 4)}", "en", "s"),
      (2L, s"${words("b", 9)} $shared", "en", "s"),
      // shares only a 10-word span with doc 1 (below minSpan=12)
      (3L, s"${words("c", 3)} ${words("a", 5)} ${words("s", 5)}", "en", "s"),
      (4L, words("q", 30), "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.longestSharedSpans(docsDf, n = 8, minSpan = 12, maxDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // docs 1 and 2: exactly the 15 shared words, once
    assert(got((1L, 2L)) === ((15L, 1L)))
    // docs 1 and 3 share "a0..a4 s0..s4" = 10 words < 12: filtered out
    assert(!got.contains((1L, 3L)))
    assert(!got.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("longestSharedSpans: a span crossing a df-capped gram splits in two") {
    // the same 30-word span in 60 docs: every gram has df=60 > maxDf=4
    // -> no pairs at all (boilerplate exclusion)
    val span = (0 until 30).map(i => s"w$i").mkString(" ")
    val many = (0L until 60L).map(i => (i, s"unique$i $span", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    assert(CorpusOps.longestSharedSpans(many, n = 8, minSpan = 8, maxDf = 4)
      .count() === 0L)
  }

  test("hash split is a pure function of doc_id with consistent buckets") {
    val docs = (0L until 1000L).map(i => (i, s"text $i", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.hashSplit(docs, trainPct = 96, valPct = 2).collect()
    assert(got.length === 1000)
    got.foreach { r =>
      val (b, s) = (r.getLong(1), r.getString(2))
      assert(b >= 0 && b < 100)
      assert(s === (if (b < 96) "train" else if (b < 98) "val" else "test"))
    }
    // deterministic across runs/orderings
    val again = CorpusOps.hashSplit(docs.orderBy(rand(7)), 96, 2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.map(r => r.getLong(0) -> r.getString(2)).toMap === again)
    // md5 spreads: every split nonempty at 1000 docs
    assert(got.map(_.getString(2)).toSet === Set("train", "val", "test"))
  }

  test("top terms rank slice-characteristic words above shared ones") {
    val docs = Seq(
      (1L, "alpha alpha alpha shared shared", "en", "web"),
      (2L, "beta beta beta shared shared", "en", "books"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.topTerms(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    // "alpha" tf=3 df=1 -> 6.0 beats "shared" tf=2 df=2 -> 2.0
    assert(got(("web", 1)) === "alpha" && got(("books", 1)) === "beta")
    assert(got(("web", 2)) === "shared" && got(("books", 2)) === "shared")
  }

  test("sequence packing fills contiguous bins with exact offsets") {
    // one lang, shards=1: doc_ids in order, 300 tokens each, capacity 512
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val docs = (1L to 4L).map(i => (i, words(300), "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.packSequences(docs, capacity = 512, shards = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    // running starts: 0, 300, 600, 900 -> bins 0,0,1,1; offsets 0,300,88,388
    assert(got === Map(1L -> ((0L, 0L)), 2L -> ((0L, 300L)),
      3L -> ((1L, 88L)), 4L -> ((1L, 388L)))) // 600-512=88, 900-512=388
  }

  test("kmeans assigns to the nearest centroid and refines it") {
    // two tight direction-clusters around (1,0) and (0,1); stride 3
    // seeds centroids at vec_ids 0 (cluster A) and 3 (cluster B)
    val vecs = Seq(
      (0L, Array(1.0f, 0.05f)), (1L, Array(1.0f, 0.1f)), (2L, Array(0.9f, 0.0f)),
      (3L, Array(0.05f, 1.0f)), (4L, Array(0.1f, 1.0f)), (5L, Array(0.0f, 0.9f)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val got = Similarity.kmeansAssign(vecs, iters = 2, centStride = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 3L))
    // sims are high within tight clusters
    val sims = Similarity.kmeansAssign(vecs, iters = 2, centStride = 3).collect()
      .map(_.getDouble(2))
    assert(sims.forall(_ > 0.99))
  }

  test("kmeans iteration moves a boundary vector to the refined centroid") {
    // seed centroids: 0 -> (1, 0), 4 -> (0, 1). Vector 6 at (0.72, 0.69)
    // leans to the seed (1,0) on iteration 1; cluster 4's centroid pulls
    // toward (0.3, 1) members, while cluster 0's pulls toward (1, 0.3)
    // members — after the update 6 stays with the cluster whose SUM
    // centroid it is closest to, exercising the unnormalized-sum path
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.3f)), (2L, Array(1.0f, 0.25f)),
      (3L, Array(1.0f, 0.28f)),
      (4L, Array(0.0f, 1.0f)), (5L, Array(0.3f, 1.0f)), (6L, Array(0.72f, 0.69f)),
      (7L, Array(0.25f, 1.0f)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val one = Similarity.kmeansAssign(vecs, iters = 1, centStride = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Similarity.kmeansAssign(vecs, iters = 2, centStride = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(6L) === 0L) // vs raw seeds: cos to (1,0) wins at iter 1
    // all non-boundary vectors keep their cluster through refinement
    Seq(0L, 1L, 2L, 3L).foreach(i => assert(two(i) === 0L))
    Seq(4L, 5L, 7L).foreach(i => assert(two(i) === 4L))
  }

  test("kmeans is deterministic under input reordering") {
    val vecs = (0L until 50L).map(i =>
      (i, Array((i % 7).toFloat + 0.1f, (i % 3).toFloat + 0.2f, 1.0f)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val a = Similarity.kmeansAssign(vecs, iters = 2, centStride = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Similarity.kmeansAssign(vecs.repartition(7).orderBy(rand(3)),
      iters = 2, centStride = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b)
  }

  test("dup-ngram stats: shared grams counted per doc, unique docs keep") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "en", "s"),
      // shares the two 3-grams "alpha beta gamma", "beta gamma delta"
      (2L, "alpha beta gamma delta zeta", "en", "s"),
      (3L, "totally unrelated words right here", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.dupNgramStats(docs, n = 3, maxDupFrac = 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))).toMap
    // 5 words → 3 distinct 3-grams each
    assert(got(1L) === ((3L, 2L, 2.0 / 3, false)))
    assert(got(2L) === ((3L, 2L, 2.0 / 3, false)))
    assert(got(3L) === ((3L, 0L, 0.0, true)))
  }

  test("dup-ngram stats: degenerate short docs compare whole text") {
    val docs = Seq(
      (1L, "tiny", "en", "s"), (2L, "tiny", "en", "s"),
      (3L, "other", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.dupNgramStats(docs, n = 8).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got === Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("quality score: fixed weights, fixed order, keep at threshold") {
    val text = "the cat sat on the mat with a hat and a bat"
    val docs = Seq((1L, text, "en", "s")).toDF("doc_id", "text", "lang", "source")
    val r = CorpusOps.qualityScore(docs, threshold = 1.0).collect()(0)
    val words = text.split(" ")
    val n = words.length.toDouble
    val ml = (text.length.toDouble - n + 1.0) / n
    val sr = words.count(Set("the", "a", "of", "and", "to", "in", "is")).toDouble / n
    val dr = words.distinct.length.toDouble / n
    val expect = 0.002 * n + 2.0 * sr + 1.5 * dr - 0.1 * ml
    assert(r.getAs[Double]("quality_score") === expect) // bit-exact
    assert(r.getAs[Boolean]("keep") === (expect >= 1.0))
    assert(r.getAs[Int]("n_words") === words.length)
  }

  test("token budget sample: per-shard budget enforced, deterministic") {
    // source by id block so every source sees all 4 shard residues
    val docs = (0L until 200L).map(i =>
      (i, Seq.fill(30)("w").mkString(" "), "en", s"src${i / 100}"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.tokenBudgetSample(docs, budgetPerSource = 240, shards = 4)
    val rows = got.collect()
    assert(rows.length === 200)
    // every (source, shard) stream keeps exactly 60/30 = 2 docs
    val kept = rows.filter(_.getAs[Boolean]("sampled"))
    val bySourceShard = kept.groupBy(r =>
      (r.getAs[String]("source"), r.getAs[Long]("shard")))
    assert(bySourceShard.size === 8)
    bySourceShard.values.foreach { g =>
      assert(g.length === 2)
      assert(g.map(_.getAs[Int]("n_tokens")).sum <= 60)
    }
    // pure function of ids: reordering input changes nothing
    val again = CorpusOps.tokenBudgetSample(
      docs.repartition(7).orderBy(rand(11)), 240, 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("sampled")).toMap
    assert(rows.map(r => r.getLong(0) -> r.getAs[Boolean]("sampled")).toMap === again)
  }

  test("token budget sample: budget must divide into shards") {
    val docs = Seq((1L, "a b", "en", "s")).toDF("doc_id", "text", "lang", "source")
    intercept[IllegalArgumentException] {
      CorpusOps.tokenBudgetSample(docs, budgetPerSource = 10, shards = 3)
    }
  }

  test("snapshot delta: in-snapshot, batch-dup, and fresh docs split correctly") {
    val snapshot = Seq(
      (1L, "previously shipped content", "en", "s"),
      (2L, "more old content", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val batch = Seq(
      (10L, "previously shipped content", "en", "s"), // already in snapshot
      (11L, "brand new content", "en", "s"),          // fresh, min of its pair
      (12L, "brand new content", "en", "s"),          // batch dup of 11
      (13L, "also new and unique", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.snapshotDelta(batch, snapshot).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), Option(r.getString(3))))).toMap
    assert(got(10L) === ((false, Some("in_snapshot"))))
    assert(got(11L) === ((true, None)))
    assert(got(12L) === ((false, Some("batch_dup"))))
    assert(got(13L) === ((true, None)))
  }

  test("snapshot delta: batch doc both in snapshot and batch-duped → in_snapshot wins") {
    val snapshot = Seq((1L, "x y z", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val batch = Seq((10L, "x y z", "en", "s"), (11L, "x y z", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.snapshotDelta(batch, snapshot).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getString(3)))).toMap
    assert(got === Map(10L -> ((false, "in_snapshot")),
      11L -> ((false, "in_snapshot"))))
  }

  test("trim shared spans: keeper keeps text, copier loses the span, full dup empties") {
    val a = (1 to 12).map(i => s"a$i").mkString(" ") // doc 1: keeper
    val b = "x1 x2 " + (1 to 8).map(i => s"a$i").mkString(" ") + " y1"
    val docs = Seq(
      (1L, a, "en", "s"),
      (2L, b, "en", "s"),                  // contains a1..a8 = doc 1's first gram
      (3L, "totally unrelated words here live happily and freely", "en", "s"),
      (4L, a, "en", "s"))                  // exact dup of 1 → fully covered
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.trimSharedSpans(docs, n = 8).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))).toMap
    assert(got(1L) === ((12, 12, 0, a)))   // keeper: untouched
    assert(got(2L) === ((11, 3, 8, "x1 x2 y1")))
    assert(got(3L)._3 === 0)               // unrelated: nothing removed
    assert(got(4L) === ((12, 0, 12, "")))  // full dup: vanishes
  }

  test("trim shared spans: docs shorter than the gram width pass through") {
    val docs = Seq((1L, "tiny doc", "en", "s"), (2L, "tiny doc", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.trimSharedSpans(docs, n = 8).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got === Map(1L -> "tiny doc", 2L -> "tiny doc"))
  }

  test("source health: hand-computed per-source counts and rates") {
    val good = (1 to 20).map(i => s"w$i").mkString(" ") + " the end" // 22 words, 1 stopword
    val repetitive = Seq.fill(30)("loop").mkString(" ")              // distinct ratio 1/30
    val docs = Seq(
      (1L, good, "en", "sA"),
      (2L, repetitive, "en", "sA"),
      (3L, "short one", "en", "sB"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = CorpusOps.sourceHealth(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val sA = got("sA")
    assert(sA.getAs[Long]("n_docs") === 2L)
    assert(sA.getAs[Long]("total_words") === 52L)
    // both pass the quality gate (word count in range, stopword ratio < 0.5)
    assert(sA.getAs[Double]("quality_rate") === 1.0)
    assert(sA.getAs[Long]("n_repetitive") === 1L)
    assert(sA.getAs[Long]("n_no_stopwords") === 1L)
    assert(sA.getAs[Double]("avg_words") === 26.0)
    val sB = got("sB")
    assert(sB.getAs[Double]("quality_rate") === 0.0) // 2 words < 20
  }

  test("word rarity: hand-computed df ratios on a 3-doc corpus") {
    val docs = Seq(
      (1L, "common words here", "en", "s"),   // common df=3, words df=2, here df=1
      (2L, "common words", "en", "s"),
      (3L, "common alone", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.wordRarity(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((3L, (3.0 + 2.0 + 1.0) / 3, (3.0 + 2.0 + 1.0) / 3 / 3)))
    assert(got(2L) === ((2L, (3.0 + 2.0) / 2, (3.0 + 2.0) / 2 / 3)))
    assert(got(3L) === ((2L, (3.0 + 1.0) / 2, (3.0 + 1.0) / 2 / 3)))
  }

  test("word rarity: repeated words in a doc count once (distinct words)") {
    val docs = Seq(
      (1L, "dup dup dup rare", "en", "s"),
      (2L, "dup other", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.wordRarity(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L))
  }

  test("mixture weights: allocations sum to the budget exactly") {
    // 7 tokens : 5 : 3 over budget 100 — floor gives 46+33+20=99,
    // the leftover unit goes to the largest remainder (a: 100*7/15
    // rem 10/15; c: rem 0; b: 100*5/15 rem 5/15 → a wins)
    val docs = Seq(
      (1L, "w w w w w w w", "en", "a"),
      (2L, "w w w w w", "en", "b"),
      (3L, "w w w", "en", "c"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.mixtureWeights(docs, budget = 100L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("a" -> ((7L, 47L)), "b" -> ((5L, 33L)), "c" -> ((3L, 20L))))
    assert(got.values.map(_._2).sum == 100L)
  }

  test("mixture weights: remainder ties break by source name") {
    // equal masses, budget not divisible: 100/3 → base 33 each,
    // leftover 1 goes to the lexicographically first source
    val docs = Seq(
      (1L, "x x", "en", "sB"), (2L, "x x", "en", "sA"), (3L, "x x", "en", "sC"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.mixtureWeights(docs, budget = 100L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("sA" -> 34L, "sB" -> 33L, "sC" -> 33L))
  }

  test("mixture weights: stable across partitionings") {
    val docs = (0 until 200)
      .map(i => (i.toLong, ("t " * (i % 9 + 1)).trim, "en", s"src${i % 7}"))
      .toDF("doc_id", "text", "lang", "source")
    val a = CorpusOps.mixtureWeights(docs.repartition(1), 12345L).collect().toSeq
    val b = CorpusOps.mixtureWeights(docs.repartition(17), 12345L).collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(2)).sum == 12345L)
  }
}
