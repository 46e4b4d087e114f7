package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class LlmOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("negative sampling: pool-only, different-label, deterministic under repartition") {
    val items = (0L until 200L).map(i => (i, (i % 7).toInt)).toDF("id", "lab")
    val rows = NegativeSampling.negatives(items, "id", "lab",
      k = 3, poolPerMille = 200).collect()
    val pool = (0L until 200L).filter(i => (i * 2654435761L) % 1000 < 200).toSet
    def labOf(i: Long) = (i % 7).toInt
    assert(rows.forall(r => pool.contains(r.getAs[Long]("neg_id"))))
    assert(rows.forall(r =>
      labOf(r.getAs[Long]("neg_id")) != labOf(r.getAs[Long]("anchor_id"))))
    val byAnchor = rows.groupBy(_.getAs[Long]("anchor_id"))
    assert(byAnchor.size === 200)
    assert(byAnchor.values.forall(
      _.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L)))
    // the sample is a pure function of (ids, labels, k, pool) — any
    // partitioning draws the same negatives
    val again = NegativeSampling.negatives(items.repartition(7), "id", "lab",
      3, 200).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("anchor_id"), r.getAs[Long]("rank"), r.getAs[Long]("neg_id"))
    assert(rows.map(key).toSet === again.map(key).toSet)
  }

  test("hard negatives: highest-cosine different-label pool candidates, deterministic") {
    val e = Seq(
      (0L, 0, Array(1.0f, 0.0f)),
      (1L, 1, Array(1.0f, 0.1f)),   // nearest different-label to 0
      (2L, 1, Array(0.0f, 1.0f)),   // orthogonal to 0
      (3L, 0, Array(1.0f, 0.0f)),   // same label as 0: never its negative
      (4L, 2, Array(-1.0f, 0.0f)))  // opposite to 0
      .toDF("vec_id", "label", "embedding")
    val rows = NegativeSampling.hardNegatives(e, "vec_id", "label", "embedding",
      k = 2, poolPerMille = 1000).collect()
    val for0 = rows.filter(_.getAs[Long]("anchor_id") == 0L)
      .sortBy(_.getAs[Long]("rank"))
    // hardest first: cos(0,1) ~ 0.995 > cos(0,2) = 0 > cos(0,4) = -1
    assert(for0.map(_.getAs[Long]("neg_id")).toSeq === Seq(1L, 2L))
    assert(for0(0).getAs[Double]("cos_sim") > 0.99)
    assert(for0(1).getAs[Double]("cos_sim") === 0.0)
    // same-label candidates never appear
    assert(rows.forall { r =>
      val a = r.getAs[Long]("anchor_id"); val n = r.getAs[Long]("neg_id")
      Seq(0, 1, 1, 0, 2)(a.toInt) != Seq(0, 1, 1, 0, 2)(n.toInt)
    })
    // pure function of the inputs: any partitioning draws the same set
    val again = NegativeSampling.hardNegatives(e.repartition(5), "vec_id",
      "label", "embedding", k = 2, poolPerMille = 1000).collect()
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("anchor_id"),
      r.getAs[Long]("rank"), r.getAs[Long]("neg_id"), r.getAs[Double]("cos_sim"))
    assert(rows.map(key).toSet === again.map(key).toSet)
  }

  test("bpe pair counts: adjacent in-word pairs, count-desc with lexicographic ties") {
    val docs = Seq((1L, "aaab aaab x"), (2L, "ab cd"), (3L, "cd z"))
      .toDF("doc_id", "text")
    // "aaab"×2 -> aa×4, ab×2; "ab" -> ab×1; "cd"×2; 1-char words skipped
    val got = CorpusOps.bpePairCounts(docs, topN = 10).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt"))).toSeq
    assert(got === Seq(("aa", 4L), ("ab", 3L), ("cd", 2L)))
    // topN truncates after the deterministic sort
    assert(CorpusOps.bpePairCounts(docs, topN = 2).collect()
      .map(_.getAs[String]("pair")).toSeq === Seq("aa", "ab"))
  }

  test("containment: small doc inside large found where Jaccard misses it") {
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val small = (10 to 19).map(i => s"w$i").mkString(" ")   // fully inside big
    val docs = Seq((1L, big), (2L, small), (3L, "zz yy xx ww vv uu"))
      .map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val rows = Dedup.containmentPairs(docs, n = 3, threshold = 0.6, maxDf = 500)
      .collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getAs[Long]("a") === 1L && r.getAs[Long]("b") === 2L)
    // all 8 of small's 3-grams are in big; big has 58 grams
    assert(r.getAs[Long]("n_shared") === 8L)
    assert(r.getAs[Double]("containment_ba") === 1.0)   // small fully inside
    assert(r.getAs[Double]("containment_ab") === 8.0 / 58.0)
    // Jaccard over the same shingle sets would be 8/58 ~ 0.14 — a
    // jaccard-0.6 screen never surfaces this pair
    assert(Dedup.jaccardPairs(docs, threshold = 0.6).collect().isEmpty)
  }

  test("containment: shingles above maxDf cannot create candidates") {
    // the shared shingle appears in ALL 10 docs -> df 10 > cap 5
    val docs = (1L to 10L).map(i => (i, s"common gram here unique$i tail$i"))
      .toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(docs, n = 3, threshold = 0.1, maxDf = 5)
      .collect()
    assert(rows.isEmpty)
  }

  test("inverted index: true df with capped ascending postings") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "beta beta gamma"), // repeated term: df counts docs, not tf
      (3L, "gamma zz a"),      // sub-minLen terms filtered
      (4L, "beta")
    ).toDF("doc_id", "text")
    val out = CorpusOps.invertedIndex(docs, k = 2).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("df"),
        r.getAs[String]("postings"))).toSet
    // beta/gamma df=3 but postings cap at the 2 smallest doc_ids
    assert(out === Set(("alpha", 1L, "1"), ("beta", 3L, "1,2"),
      ("gamma", 3L, "1,2")))
  }

  private def docsDf = Seq(
    (1L, "the cat sat on the mat", "en", "s1"),
    (2L, "the cat sat on the mat", "en", "s2"),          // exact dup of 1
    (3L, "The cat, sat on the MAT!", "en", "s3"),        // normalized dup of 1
    (4L, "completely different words here entirely", "en", "s4"),
    (5L, "the cat sat on the hat", "en", "s5"))          // near dup of 1
    .toDF("doc_id", "text", "lang", "source")
    .withColumn("n_chars", length(col("text")))

  test("exact dedup finds the identical pair only") {
    val r = Dedup.exactSummary(docsDf).collect()(0)
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_distinct_texts") === 4L)
    assert(r.getAs[Long]("n_dup_groups") === 1L)
    assert(r.getAs[Long]("n_rows_to_drop") === 1L)
  }

  test("normalized dedup also collapses case/punctuation variants") {
    val groups = Dedup.normalizedDedup(docsDf).collect()
    assert(groups.length === 3) // {1,2,3}, {4}, {5}
    val big = groups.filter(_.getAs[Long]("group_size") == 3L)
    assert(big.length === 1 && big(0).getAs[Long]("keep_id") === 1L)
  }

  test("jaccard pairs rank near-dups above unrelated docs") {
    val pairs = Dedup.jaccardPairs(docsDf, threshold = 0.5, lenTol = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) === 1.0) // identical
    assert(pairs((1L, 5L)) > 0.5 && pairs((1L, 5L)) < 1.0)
    assert(!pairs.contains((1L, 4L)))
  }

  test("minhash: identical docs share all signatures, near-dups most") {
    val sigs = Dedup.minhashSignatures(docsDf, k = 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => r.getLong(i))).toMap
    assert(sigs(1L) === sigs(2L))
    val matches15 = sigs(1L).zip(sigs(5L)).count { case (a, b) => a == b }
    val matches14 = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(matches15 > matches14)
  }

  test("lsh candidates include the exact pair") {
    val pairs = Dedup.lshCandidatePairs(docsDf, k = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("lsh bucket cap: degenerate bucket is skipped and surfaced, not expanded") {
    // 200 identical texts (tiers 1-2 NOT run first): every band collapses
    // them into one 200-wide bucket — exactly the shape that OOMs an
    // uncapped collect_set + quadratic pair explode at corpus scale.
    val degenerate = (1L to 200L).map(i => (i, "exact same boilerplate text", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val pairs = Dedup.lshCandidatePairs(degenerate, k = 8, bands = 4, maxBucket = 50)
    assert(pairs.count() === 0L)
    val skipped = Dedup.lshSkippedBuckets(degenerate, k = 8, bands = 4, maxBucket = 50)
      .collect()
    assert(skipped.length === 4) // one 200-wide bucket per band
    assert(skipped.forall(_.getAs[Int]("n_ids") === 200))
    // with the cap above the bucket width the pairs come back
    assert(Dedup.lshCandidatePairs(degenerate, k = 8, bands = 4, maxBucket = 200)
      .count() === 200L * 199 / 2)
  }

  test("lsh bucket cap: 10k near-identical docs that survive tier 2 stay bounded") {
    // Adversarial corpus: shared boilerplate + a unique trailing token, so
    // canonicalization does NOT collapse them (distinct alnum content) but
    // minhash puts most docs in the same band buckets.
    val adversarial = (1L to 10000L).map(i =>
      (i, s"this cookie banner asks you to accept all cookies before reading variant$i",
        "en", "s")).toDF("doc_id", "text", "lang", "source")
    assert(Dedup.normalizedDedup(adversarial).count() === 10000L) // tier 2 can't help
    val skipped = Dedup.lshSkippedBuckets(adversarial, k = 8, bands = 4, maxBucket = 100)
      .collect()
    assert(skipped.nonEmpty, "expected at least one degenerate bucket")
    assert(skipped.map(_.getAs[Int]("n_ids")).max > 5000, "corpus should be degenerate")
    // capped pair generation is bounded by bands * C(maxBucket, 2), nowhere
    // near the C(10k, 2) = 50M an uncapped expand would emit
    val nPairs = Dedup.lshCandidatePairs(adversarial, k = 8, bands = 4, maxBucket = 100)
      .count()
    assert(nPairs <= 4L * 100 * 99 / 2, s"pairs not bounded by the cap: $nPairs")
  }

  test("lshCandidates: pairs and overflow are consistent views of one call") {
    val degenerate = (1L to 200L).map(i => (i, "exact same boilerplate text", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    // the materialize hook sees the shared bucket aggregation exactly once
    var hookCalls = 0
    val cands = Dedup.lshCandidates(degenerate, k = 8, bands = 4, maxBucket = 50,
      materialize = { df => hookCalls += 1; df.localCheckpoint() })
    assert(hookCalls === 1, "both views must share ONE bucket aggregation")
    assert(cands.pairs.count() === 0L)
    val skipped = cands.skippedBuckets.collect()
    assert(skipped.length === 4 && skipped.forall(_.getAs[Int]("n_ids") === 200))
  }

  test("estimated jaccard: identical docs agree on all k components") {
    val est = Dedup.estimatedJaccardPairs(docsDf, k = 8, bands = 4, shingle = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getAs[Int]("k_agree"),
        r.getAs[Double]("est_jaccard")))).toMap
    assert(est((1L, 2L)) === ((8, 1.0))) // exact dup: every minhash equal
    est.values.foreach { case (k, e) =>
      assert(k >= 0 && k <= 8 && e === k / 8.0)
    }
    // estimates cover exactly the LSH candidate set
    val cand = Dedup.lshCandidatePairs(docsDf, k = 8, bands = 4, shingle = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(est.keySet === cand)
  }

  test("simhash near-dup pairs: identical docs at hamming 0, unrelated absent") {
    val got = Dedup.simhashNearDupPairs(docsDf, bits = 32, bands = 4,
      maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got((1L, 2L)) === 0) // identical texts -> identical fingerprints
    assert(!got.keySet.exists { case (a, b) => Set(a, b) == Set(1L, 4L) })
    // every emitted pair respects the hamming bound
    assert(got.values.forall(_ <= 3))
  }

  test("simhash near-dup pairs: pigeonhole precondition is enforced") {
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docsDf, bits = 32, bands = 4, maxHamming = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docsDf, bits = 32, bands = 5)
    }
  }

  test("heuristic filter: each rule trips on its designed offender") {
    val tricky = Seq(
      (1L, "the quick brown fox jumps over a lazy dog today.", "en", "s"), // clean
      (2L, "too short.", "en", "s"),                          // word_count
      (3L, "the aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbbbbbbbbbb " +
        "cccccccccccccccccccccccccccccc dddddddddddddddddddddddddddddd.", "en", "s"), // mean_word_len
      (4L, "the 1 2 3 4 5 6 7 8 9.", "en", "s"),              // alpha_ratio
      (5L, "quick brown foxes jump over lazy dogs daily without fail.", "en", "s"), // no stopword
      (6L, "the word word word word word word word word word word word word.", "en", "s"), // repetition
      (7L, "the quick brown fox jumps over a lazy dog today", "en", "s")) // no terminal punct
      .toDF("doc_id", "text", "lang", "source")
    val out = TextStats.heuristicFilter(tricky).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("word_count_ok"))
    assert(!out(3L).getAs[Boolean]("mean_word_len_ok"))
    assert(!out(4L).getAs[Boolean]("alpha_ratio_ok"))
    assert(!out(5L).getAs[Boolean]("stopword_ok"))
    assert(!out(6L).getAs[Boolean]("repetition_ok"))
    assert(!out(7L).getAs[Boolean]("terminal_punct_ok"))
    assert((2L to 7L).forall(i => !out(i).getAs[Boolean]("keep")))
  }

  test("lshPlan picks the factorization whose s-curve inflection hits the threshold") {
    // k=16, threshold 0.5: inflections are (1/b)^(1/r) over b*r=16 —
    // b=4,r=4 gives 0.707; b=8,r=2 gives 0.354; b=16,r=1 gives 0.0625;
    // b=2,r=8 gives 0.917. Closest to 0.5 is (8,2)? |0.354-0.5|=0.146
    // vs (4,4) |0.207|. So (8,2).
    assert(Dedup.lshPlan(0.5, 16) === ((8, 2)))
    // high threshold wants few bands of many rows
    val (bHi, rHi) = Dedup.lshPlan(0.9, 16)
    assert(bHi <= 2 && bHi * rHi == 16)
    // the plan's collision prob is monotone in s and high at the target
    val (b, r) = Dedup.lshPlan(0.7, 16)
    val p = Dedup.lshCollisionProb(0.85, b, r)
    assert(p > Dedup.lshCollisionProb(0.5, b, r))
    assert(p > 0.5)
  }

  test("dedupCorpus: over-cap buckets surface per-doc as lsh_overflow, never silently") {
    val adversarial = (1L to 500L).map(i =>
      (i, s"this cookie banner asks you to accept all cookies before reading variant$i",
        "en", "s")).toDF("doc_id", "text", "lang", "source")
    val out = Dedup.dedupCorpus(adversarial, threshold = 0.5, k = 8, bands = 4,
      maxBucket = 100).collect()
    assert(out.length === 500) // verdict covers every doc
    val overflow = out.filter(_.getAs[Boolean]("lsh_overflow"))
    assert(overflow.nonEmpty, "degenerate corpus should overflow the cap")
    // the flag marks PARTIAL near-dup coverage (an overflowed band),
    // never a tier-1/2 drop: a flagged doc is always a tier-3 survivor,
    // and if it dropped anyway (matched via a narrower band) the
    // verdict stays consistent (keep=false implies a reason)
    assert(overflow.forall(r => r.getAs[String]("drop_reason") != "normalized_dup"))
    assert(out.forall(r =>
      r.getAs[Boolean]("keep") == (r.getAs[String]("drop_reason") == null)))
  }

  test("dedupCorpus: materialize hook preserves results exactly") {
    val lazyOut = Dedup.dedupCorpus(docsDf, threshold = 0.5, k = 8, bands = 4)
      .orderBy("doc_id").collect().toSeq
    val hooked = Dedup.dedupCorpus(docsDf, threshold = 0.5, k = 8, bands = 4,
        materialize = _.localCheckpoint())
      .orderBy("doc_id").collect().toSeq
    assert(hooked === lazyOut)
  }

  test("simhash: identical docs equal, near-dups close in hamming") {
    val sh = Dedup.simhash(docsDf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(sh(1L) === sh(2L))
    assert(hamming(sh(1L), sh(5L)) < hamming(sh(1L), sh(4L)))
  }

  test("pii redaction: typed placeholders, per-category counts, clean text untouched") {
    val t = Seq(
      (1L, "contact alice.smith+x@example.org or bob@mail.co today"),
      (2L, "server at 192.168.1.10 and 10.0.0.1 port 8080"),
      (3L, "call +84123456789 now"),
      (4L, "no pii here at all"))
      .toDF("doc_id", "text")
    val out = TextStats.redactPii(t).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_email") === 2)
    assert(out(2L).getAs[Int]("n_ipv4") === 2)
    assert(out(3L).getAs[Int]("n_phone") === 1)
    assert(out(4L).getAs[Int]("n_email") + out(4L).getAs[Int]("n_ipv4") +
      out(4L).getAs[Int]("n_phone") === 0)
    // clean text passes through byte-identical
    val cleanMd5 = t.filter(col("doc_id") === 4L)
      .select(md5(col("text"))).head().getString(0)
    assert(out(4L).getAs[String]("redacted_md5") === cleanMd5)
    // redaction output is EXACTLY the typed placeholders in place —
    // including the ordering property (email host dots become <EMAIL>,
    // never claimed by the IP pattern)
    def md5Of(s: String) = t.sparkSession.range(1)
      .select(md5(lit(s))).head().getString(0)
    assert(out(1L).getAs[String]("redacted_md5") ===
      md5Of("contact <EMAIL> or <EMAIL> today"))
    assert(out(2L).getAs[String]("redacted_md5") ===
      md5Of("server at <IP> and <IP> port 8080"))
    assert(out(3L).getAs[String]("redacted_md5") === md5Of("call <PHONE> now"))
  }

  test("repetition metrics: looping text scores high, varied text low") {
    val t = Seq(
      (1L, "spam spam spam spam"),                 // one word repeated
      (2L, "all words here are unique tokens"),    // no repetition
      (3L, "solo"))                                // too short for bigrams
      .toDF("doc_id", "text")
    val out = TextStats.repetitionMetrics(t).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("frac_top_word") === 1.0)
    assert(out(1L).getAs[Double]("frac_top_bigram") === 1.0) // 3 of 3 bigrams
    assert(out(2L).getAs[Double]("frac_top_word") === 1.0 / 6)
    assert(out(3L).getAs[Int]("n_words") === 1)
    assert(out(3L).getAs[Double]("frac_top_bigram") === 0.0)
  }

  test("int8 quantization: bounds, zero guard, error within scale/2") {
    val e = Seq(
      (0L, Array(1.0f, -0.5f, 0.25f)),
      (1L, Array(0.0f, 0.0f, 0.0f)),       // zero vector
      (2L, Array(127.0f, -127.0f, 63.5f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(e).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    val q0 = out(0L).getAs[scala.collection.Seq[Int]]("qvec")
    assert(q0 === Seq(127, -64, 32)) // scale = 1/127; -63.5 rounds away from zero
    assert(out(1L).getAs[scala.collection.Seq[Int]]("qvec") === Seq(0, 0, 0))
    assert(out(1L).getAs[Double]("max_abs_err") === 0.0)
    out.values.foreach { r =>
      val scale = r.getAs[Double]("scale")
      assert(r.getAs[scala.collection.Seq[Int]]("qvec").forall(q => q >= -127 && q <= 127))
      assert(r.getAs[Double]("max_abs_err") <= scale / 2 + 1e-12)
    }
  }

  test("cosine top-k: orthogonal vs parallel vectors") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(2.0f, 0.0f, 0.0f), 0),   // parallel to 0
      (2L, Array(0.0f, 1.0f, 0.0f), 1),   // orthogonal
      (3L, Array(-1.0f, 0.0f, 0.0f), 2))  // opposite
      .toDF("vec_id", "embedding", "label")
    val top = Similarity.cosineTopK(e, Seq(0L), k = 3)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 2L, 3L))
    assert(top(0).getAs[Double]("cos_sim") === 1.0)
    assert(top(1).getAs[Double]("cos_sim") === 0.0)
    assert(top(2).getAs[Double]("cos_sim") === -1.0)
  }

  test("lsh buckets put identical-direction vectors together") {
    val e = Seq(
      (0L, Array.fill(8)(0.5f), 0),
      (1L, Array.fill(8)(1.0f), 0),
      (2L, Array.fill(8)(-0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val b = Similarity.lshBuckets(e, nPlanes = 4).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("bucket")).toMap
    assert(b(0L) === b(1L))
    assert(b(0L) !== b(2L))
  }

  test("multimodal: schema, batch extraction, deterministic stub") {
    val media = Multimodal.asMediaTable(docsDf)
    assert(media.schema("payload").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).checksum === feats(2L).checksum) // same payload
    assert(feats(1L).n_bytes === 22L)
    assert(feats(1L).width === 22 && feats(1L).height === 22)
  }

  test("dedupCorpus: ladder drops exact, normalized, and near dups with reasons") {
    val out = Dedup.dedupCorpus(docsDf, threshold = 0.5, k = 8, bands = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), Option(r.getAs[String]("drop_reason")))).toMap
    assert(out(1L) == (true, None))                       // canonical survivor
    assert(out(2L) == (false, Some("normalized_dup")))    // exact dup of 1
    assert(out(3L) == (false, Some("normalized_dup")))    // case/punct dup of 1
    assert(out(4L) == (true, None))                       // unrelated
    assert(out(5L) == (false, Some("near_dup")))          // near dup of 1
  }

  test("multimodal resize: exact target size, deterministic, repeats short input") {
    val media = Multimodal.asMediaTable(docsDf)
    val out = Multimodal.resizeBatch(spark, media, 8, 4).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out.values.forall(r => r.payload.length == 32 && r.width == 8 && r.height == 4))
    // same payload -> same resized bytes
    assert(out(1L).payload.toSeq === out(2L).payload.toSeq)
    // target larger than source: strided repeat still fills exactly w*h
    assert(out(1L).payload.toSeq.distinct.nonEmpty)
  }

  test("multimodal frame sampling: every stride-th frame, correct indices") {
    val media = Multimodal.asMediaTable(docsDf.filter(col("doc_id") === 1L))
    // payload is 22 bytes -> 6 frames of 4 bytes (last partial); stride 2
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 4, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    assert(frames.forall(_.doc_id == 1L))
    assert(frames.head.payload.toSeq === "the ".getBytes("UTF-8").toSeq)
  }

  test("dctHash: real pHash invariances — brightness shifts at most the DC bit, contrast none") {
    val base = Array.tabulate(32 * 32)(i => (i * 37 + i * i % 91) % 200)
    val h0 = Multimodal.dctHash(base)
    assert(h0 === Multimodal.dctHash(base.clone())) // deterministic
    // uniform brightness shift: AC coefficients are shift-invariant
    // (every k>=1 basis row sums to 0), so only the DC bit may differ
    val brighter = base.map(_ + 40)
    assert(java.lang.Long.bitCount(h0 ^ Multimodal.dctHash(brighter)) <= 1)
    // contrast scaling: all coefficients AND the mean scale together -> no bit moves
    val scaled = base.map(_ * 5)
    assert(Multimodal.dctHash(scaled) === h0)
    // a single-pixel corruption moves few low-frequency signs
    val corrupted = base.clone(); corrupted(500) = 255
    assert(java.lang.Long.bitCount(h0 ^ Multimodal.dctHash(corrupted)) < 16)
  }

  test("multimodal perceptual hash: identical payloads collide, near pairs found, no cartesian") {
    val media = Multimodal.asMediaTable(docsDf)
    val hashes = Multimodal.perceptualHash(spark, media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L)) // byte-identical payloads
    val pairs = Multimodal.phashNearDupPairs(spark, media, maxHamming = 0)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .contains((1L, 2L)))
    val plan = pairs.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("cartesianproduct"), s"plan:\n$plan")
    // hamming radius widens monotonically
    val n0 = pairs.count()
    val n6 = Multimodal.phashNearDupPairs(spark, media, maxHamming = 6).count()
    assert(n6 >= n0)
  }

  test("phash banding guarantees recall: every pair within the radius is found") {
    import spark.implicits._
    // synthetic media whose payloads are tuned so hashes differ in a
    // CONTROLLED number of scattered bits — brute-force is the oracle
    val media = Multimodal.asMediaTable(
      (1 to 24).map(i => (i.toLong, ("x" * (i % 7 + 1)) + " tail " + ("y" * i),
        "en", "s", i.toLong)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val hashes = Multimodal.perceptualHash(spark, media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (radius <- Seq(2, 6, 10)) {
      val want = (for {
        a <- hashes.keys; b <- hashes.keys if a < b
        d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= radius
      } yield (a, b, d)).toSet
      val got = Multimodal.phashNearDupPairs(spark, media, radius).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want, s"radius $radius: missing ${want -- got}, extra ${got -- want}")
    }
  }

  test("language id is deterministic and self-consistent on one-lang corpus") {
    val out = TextStats.langId(docsDf).collect()
    assert(out.length === 5)
    assert(out.forall(_.getAs[String]("predicted_lang") === "en"))
    assert(out.forall(_.getAs[Boolean]("correct")))
  }
}
