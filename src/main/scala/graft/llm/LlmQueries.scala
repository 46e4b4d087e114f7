package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Query registry for the LLM-data-pipeline operators (dedup,
  * similarity search, text analysis, multimodal) with their DuckDB
  * oracles. The operators live in [[Dedup]], [[Similarity]],
  * [[TextStats]], [[Multimodal]]; wrappers here bind them to the test
  * tables and fix deterministic output orderings.
  */
object LlmQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  // ---- shared SQL fragments (oracle side) ------------------------------

  /** DuckDB list of word 3-gram shingles, distinct. */
  private val shinglesSql =
    """list_distinct(CASE WHEN len(string_split(text, ' ')) < 3 THEN [text]
      |  ELSE list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
      |         i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))
      |  END)""".stripMargin

  // ---------------------------------------------------------------- q40
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.exactSummary(docs(s, dir))

  val exactDedupSql: String =
    """SELECT COUNT(*) AS n_distinct_texts, CAST(SUM(n) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
      |  CAST(SUM(n - 1) AS BIGINT) AS n_rows_to_drop
      |FROM (SELECT md5(text) AS h, COUNT(*) AS n FROM documents GROUP BY 1)""".stripMargin

  // ---------------------------------------------------------------- q41
  def normalizedDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.normalizedDedup(docs(s, dir)).orderBy("canon_hash")

  val normalizedDedupSql: String =
    """SELECT md5(canon) AS canon_hash, MIN(doc_id) AS keep_id, COUNT(*) AS group_size
      |FROM (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
      |        '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS canon FROM documents)
      |GROUP BY 1 ORDER BY canon_hash""".stripMargin

  // ---------------------------------------------------------------- q42
  def minhashLshPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.lshCandidatePairs(docs(s, dir), k = 8, bands = 4, shingle = 3,
      maxBucket = 1000)
      .orderBy("a", "b")

  /** sh -> sx -> sig -> banded -> wide -> cand CTE chain over a
    * `docsRel` relation with (doc_id, text) — shared by q42 and q54.
    * `wide` mirrors the engine's maxBucket cap: buckets wider than the
    * cap produce no candidate pairs (so the gate verifies the CAP
    * SEMANTICS too, not just the uncapped path — a fixture corpus with
    * a degenerate bucket would diverge otherwise). */
  private def lshCandidateCtes(docsRel: String, maxBucket: Int = 1000): String = {
    val sigCols = (0 until 8).map { i =>
      val (a, b) = Dedup.affine(i)
      s"list_min(list_transform(xs, x -> ($a * x + $b) % ${Dedup.MersennePrime})) AS mh$i"
    }.mkString(",\n    ")
    val bandRows = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS band, md5(mh${2 * b} || '|' || mh${2 * b + 1}) AS bucket FROM sig")
      .mkString("\n  UNION ALL ")
    s"""sh AS (SELECT doc_id, $shinglesSql AS shingles FROM $docsRel),
       |sx AS (SELECT doc_id, list_transform(shingles,
       |         s -> CAST('0x' || substr(md5(s), 1, 12) AS BIGINT)) AS xs FROM sh),
       |sig AS (SELECT doc_id,
       |    $sigCols
       |  FROM sx),
       |banded AS (
       |  $bandRows),
       |wide AS (SELECT band, bucket FROM banded
       |         GROUP BY 1, 2 HAVING COUNT(*) > $maxBucket),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM banded l JOIN banded r
       |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
       |  WHERE NOT EXISTS (SELECT 1 FROM wide w
       |    WHERE w.band = l.band AND w.bucket = l.bucket))""".stripMargin
  }

  val minhashLshPairsSql: String =
    s"""WITH ${lshCandidateCtes("documents")}
       |SELECT a, b FROM cand ORDER BY a, b""".stripMargin

  // ---------------------------------------------------------------- q43
  def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(docs(s, dir), threshold = 0.5, lenTol = 5).orderBy("a", "b")

  /** `ws` + `pr` CTEs — the blocked-and-verified Jaccard pair predicate,
    * shared by q43 and q61 so their edge sets can never silently
    * diverge if threshold/blocking/tokenization is ever tuned. */
  private[llm] val jaccardPairCtes: String =
    """ws AS (SELECT doc_id, lang, n_chars,
      |         list_distinct(string_split(text, ' ')) AS w FROM documents),
      |pr AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b,
      |    CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
      |      (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) AS jaccard
      |  FROM ws a JOIN ws b
      |    ON a.lang = b.lang AND a.doc_id < b.doc_id
      |   AND abs(a.n_chars - b.n_chars) <= 5
      |  WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
      |      (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.5)""".stripMargin

  val jaccardPairsSql: String =
    s"""WITH $jaccardPairCtes
       |SELECT a, b, jaccard FROM pr ORDER BY a, b""".stripMargin

  // ---------------------------------------------------------------- q176
  /** Exact Jaccard ≥ 3/5 pair join via prefix filtering — the
    * COMPLETE all-pairs similarity join ([[Dedup.prefixJaccardPairs]]),
    * no blocking tolerance to tune: the oracle re-derives the same
    * rarest-first prefix scheme, so candidate generation AND the
    * integer cross-multiplied verify are checked cross-engine.
    *
    * The gate runs a deterministic 12.5% slice: this synthetic corpus
    * is near-duplicate SATURATED (57% of all pairs clear J ≥ 0.6 at
    * sf0.01), so the full exact join is output-bound quadratic BY
    * DEFINITION of the task — no algorithm emits o(matches) — and the
    * slice keeps the gate exercising every stage at list-not-the-
    * output cost. Real corpora sit in the opposite regime (sparse
    * matches), which is exactly where prefix filtering's completeness
    * is worth its price; on a saturated corpus the operator's own
    * saturation guard (engaged here, generous cap) aborts before the
    * candidate join and points at the LSH ladder (q42/q54) whose
    * banding caps candidate fan-out instead. */
  def prefixJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.prefixJaccardPairs(docs(s, dir).filter(col("doc_id") % 8 === 0),
      p = 3, q = 5, materialize = _.localCheckpoint(),
      maxCandidatePairs = 50_000_000L).orderBy("a", "b")

  val prefixJaccardSql: String =
    """WITH ws AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS w
      |  FROM documents WHERE doc_id % 8 = 0),
      |tok AS (SELECT doc_id, len(w) AS sz, unnest(w) AS tok FROM ws),
      |dfs AS (SELECT tok, COUNT(*) AS df FROM tok GROUP BY tok),
      |pfx AS (
      |  SELECT doc_id, sz, tok FROM (
      |    SELECT doc_id, sz, tok,
      |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY df, tok) AS pos
      |    FROM tok JOIN dfs USING (tok))
      |  WHERE pos <= sz - (3 * sz + 4) // 5 + 1),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      |  FROM pfx a JOIN pfx b USING (tok)
      |  WHERE a.doc_id < b.doc_id
      |    AND 5 * a.sz >= 3 * b.sz AND 5 * b.sz >= 3 * a.sz),
      |v AS (
      |  SELECT a, b,
      |    CAST(len(list_intersect(wa.w, wb.w)) AS BIGINT) AS inter_sz,
      |    CAST(len(wa.w) + len(wb.w) - len(list_intersect(wa.w, wb.w)) AS BIGINT)
      |      AS union_sz
      |  FROM cand JOIN ws wa ON wa.doc_id = a JOIN ws wb ON wb.doc_id = b)
      |SELECT a, b, inter_sz, union_sz FROM v
      |WHERE 5 * inter_sz >= 3 * union_sz ORDER BY a, b""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Near-dup pairs folded into duplicate clusters: connected
    * components over the q43 Jaccard edges, each doc labeled with its
    * cluster's min doc_id (the canonical survivor). */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    // near-dup graphs are metadata-scale next to the corpus: a few
    // loop partitions keep per-round launch overhead, the dominant
    // cost, proportionate
    graft.operators.ConnectedComponents(
      Dedup.jaccardPairs(docs(s, dir), threshold = 0.5, lenTol = 5)
        .select(col("a"), col("b")),
      numPartitions = 8)
      .orderBy("id")

  val dedupClustersSql: String =
    s"""WITH RECURSIVE $jaccardPairCtes,
      |sym AS (SELECT a AS src, b AS dst FROM pr
      |        UNION SELECT b, a FROM pr),
      |walk(id, label) AS (
      |  SELECT src, src FROM sym
      |  UNION
      |  SELECT s.dst, w.label FROM walk w JOIN sym s ON s.src = w.id)
      |SELECT id, MIN(label) AS component FROM walk GROUP BY id
      |ORDER BY id""".stripMargin

  // ---------------------------------------------------------------- q44
  def simhashFingerprints(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(docs(s, dir), bits = 32).orderBy("doc_id")

  /** `sh(doc_id, simhash)` CTE chain — shared by q44 (32-bit) and q55
    * (48-bit: wider fingerprints keep band buckets selective on a
    * near-dup-rich corpus, the Manku-et-al web-dedup sizing). */
  private def simhashCtes(bits: Int): String = {
    val bitExprs = (0 until bits).map { j =>
      s"(CASE WHEN CAST(list_sum(list_transform(xs, x -> CASE WHEN (x >> $j) & 1 = 1 " +
        s"THEN 1 ELSE -1 END)) AS BIGINT) > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
    s"""shx AS (SELECT doc_id, list_transform(list_distinct(string_split(text, ' ')),
       |        x -> CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)) AS xs
       |      FROM documents),
       |sh AS (SELECT doc_id, $bitExprs AS simhash FROM shx)""".stripMargin
  }

  val simhashFingerprintsSql: String =
    s"""WITH ${simhashCtes(32)}
       |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q55
  // maxBucket=100: the synthetic corpus is near-dup-RICH (template
  // docs), so band buckets routinely hold hundreds of genuinely
  // similar docs; a pair-shaped output over those is quadratic in
  // cluster size. The cap excludes-and-surfaces degenerate clusters
  // (treat the whole bucket as one dup cluster downstream) and keeps
  // the pair list linear-ish — the same discipline as q42's LSH cap,
  // mirrored in the oracle's HAVING clause.
  def simhashNearDup(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupPairs(docs(s, dir), bits = 48, bands = 4,
      maxHamming = 3, maxBucket = 100, materialize = _.localCheckpoint())
      .orderBy("a", "b")

  val simhashNearDupSql: String = {
    val bandRows = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS band, substr(simhash, ${b * 12 + 1}, 12) AS bucket FROM sh")
      .mkString("\n  UNION ALL ")
    s"""WITH ${simhashCtes(48)},
       |sbanded AS (
       |  $bandRows),
       |swide AS (SELECT band, bucket FROM sbanded
       |          GROUP BY 1, 2 HAVING COUNT(*) > 100),
       |scand AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM sbanded l JOIN sbanded r
       |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
       |  WHERE NOT EXISTS (SELECT 1 FROM swide w
       |    WHERE w.band = l.band AND w.bucket = l.bucket)),
       |ham AS (
       |  SELECT a, b, CAST(list_sum(list_transform(range(1, 49),
       |    i -> CASE WHEN substr(sa.simhash, CAST(i AS INT), 1) <>
       |         substr(sb.simhash, CAST(i AS INT), 1) THEN 1 ELSE 0 END)) AS INT)
       |    AS hamming
       |  FROM scand JOIN sh sa ON sa.doc_id = scand.a
       |  JOIN sh sb ON sb.doc_id = scand.b)
       |SELECT a, b, hamming FROM ham WHERE hamming <= 3 ORDER BY a, b""".stripMargin
  }

  // ---------------------------------------------------------------- q45
  private val knnQueryIds = Seq(0L, 1L, 2L, 3L, 4L)

  def cosineTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineTopK(emb(s, dir), knnQueryIds, k = 10)
      .orderBy("query_id", "rank")

  val cosineTopKSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qe FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
       |scored AS (
       |  SELECT query_id, vec_id, ${cosSql("qe", "v")} AS cos_sim
       |  FROM e CROSS JOIN q WHERE vec_id <> query_id)
       |SELECT query_id, rank, vec_id, cos_sim FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, vec_id) AS rank FROM scored)
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q46
  def annBucketTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.annTopKInBucket(emb(s, dir), knnQueryIds, k = 5, nPlanes = 8)
      .orderBy("query_id", "rank")

  val annBucketTopKSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, $bucketSql AS bucket FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qe, bucket FROM b
       |      WHERE vec_id IN (0, 1, 2, 3, 4)),
       |scored AS (
       |  SELECT query_id, vec_id, ${cosSql("qe", "v")} AS cos_sim
       |  FROM b JOIN q USING (bucket) WHERE vec_id <> query_id)
       |SELECT query_id, rank, vec_id, cos_sim FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, vec_id) AS rank FROM scored)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q177
  /** Binary sign-bit ANN ([[Similarity.binaryHammingTopK]]): Hamming
    * scan over 1-bit-per-dim packed words (the 32x-smaller phase-1
    * read), exact-cosine rerank of the 3k survivors. The oracle
    * re-derives the identical packing, popcount ranking, AND rerank —
    * both phases cross-engine-checked. */
  def binaryHammingTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.binaryHammingTopK(emb(s, dir), knnQueryIds, k = 5, mult = 3)
      .orderBy("query_id", "rank")

  val binaryHammingTopKSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |wrd AS (SELECT vec_id, v,
       |    list_transform(range((len(v) + 31) // 32), w ->
       |      CAST(list_sum(list_transform(range(32), j ->
       |        CASE WHEN 32 * w + j < len(v) AND v[32 * w + j + 1] > 0
       |        THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT)) AS words
       |  FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qe, words AS qwords FROM wrd
       |      WHERE vec_id IN (0, 1, 2, 3, 4)),
       |ham AS (
       |  SELECT query_id, vec_id, v, qe,
       |    CAST(list_sum(list_transform(range(len(words)), i ->
       |      bit_count(xor(words[i + 1], qwords[i + 1])))) AS BIGINT) AS hamming
       |  FROM wrd CROSS JOIN q WHERE vec_id <> query_id),
       |cand AS (SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY hamming, vec_id) AS hrk FROM ham)
       |  WHERE hrk <= 15),
       |rer AS (SELECT query_id, vec_id, hamming,
       |    ${cosSql("qe", "v")} AS cos_sim FROM cand)
       |SELECT query_id, rank, vec_id, hamming, cos_sim FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, vec_id) AS rank FROM rer)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q47
  def langId(s: SparkSession, dir: String): DataFrame =
    TextStats.langId(docs(s, dir)).orderBy("doc_id")

  val langIdSql: String =
    """WITH dw AS (SELECT doc_id, lang,
      |              unnest(list_distinct(string_split(text, ' '))) AS word
      |            FROM documents),
      |prof AS (SELECT profile_lang, word FROM (
      |  SELECT lang AS profile_lang, word, COUNT(*) AS freq,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, word) AS rk
      |  FROM dw GROUP BY lang, word) WHERE rk <= 10),
      |ov AS (SELECT doc_id, lang, profile_lang, COUNT(*) AS overlap
      |       FROM dw JOIN prof USING (word) GROUP BY 1, 2, 3)
      |SELECT doc_id, lang, profile_lang AS predicted_lang, overlap,
      |       lang = profile_lang AS correct
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |        ORDER BY overlap DESC, profile_lang) AS rk FROM ov)
      |WHERE rk = 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q48
  def qualityMetrics(s: SparkSession, dir: String): DataFrame =
    TextStats.qualityMetrics(docs(s, dir)).orderBy("doc_id")

  val qualityMetricsSql: String =
    """SELECT doc_id, lang, n_chars,
      |  len(string_split(text, ' ')) AS n_words,
      |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |    / len(string_split(text, ' ')) AS avg_word_len,
      |  CAST(len(list_filter(string_split(text, ' '),
      |    w -> list_contains(['the','a','of','and','to','in','is'], w))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS stopword_ratio,
      |  (len(string_split(text, ' ')) BETWEEN 20 AND 200
      |   AND CAST(len(list_filter(string_split(text, ' '),
      |     w -> list_contains(['the','a','of','and','to','in','is'], w))) AS DOUBLE)
      |     / len(string_split(text, ' ')) < 0.5) AS passes_quality
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q56
  def heuristicFilter(s: SparkSession, dir: String): DataFrame =
    TextStats.heuristicFilter(docs(s, dir)).orderBy("doc_id")

  val heuristicFilterSql: String =
    """SELECT doc_id, n_words, word_count_ok, mean_word_len_ok, alpha_ratio_ok,
      |  stopword_ok, repetition_ok, terminal_punct_ok,
      |  (word_count_ok AND mean_word_len_ok AND alpha_ratio_ok AND stopword_ok
      |   AND repetition_ok AND terminal_punct_ok) AS keep
      |FROM (
      |  SELECT doc_id,
      |    len(w) AS n_words,
      |    len(w) BETWEEN 5 AND 10000 AS word_count_ok,
      |    CAST(length(text) - len(w) + 1 AS DOUBLE) / len(w) BETWEEN 2.0 AND 12.0
      |      AS mean_word_len_ok,
      |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
      |      / len(w) >= 0.8 AS alpha_ratio_ok,
      |    len(list_filter(w, x -> list_contains(
      |      ['the','a','of','and','to','in','is'], x))) >= 1 AS stopword_ok,
      |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= 0.3 AS repetition_ok,
      |    right(text, 1) IN ('.', '!', '?') AS terminal_punct_ok
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q59
  def repetitionMetrics(s: SparkSession, dir: String): DataFrame =
    TextStats.repetitionMetrics(docs(s, dir)).orderBy("doc_id")

  val repetitionMetricsSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |n AS (SELECT doc_id, len(w) AS n_words FROM w),
      |wc AS (SELECT doc_id, g, COUNT(*) AS c
      |       FROM (SELECT doc_id, unnest(w) AS g FROM w) GROUP BY 1, 2),
      |mw AS (SELECT doc_id, MAX(c) AS mc FROM wc GROUP BY 1),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |         i -> w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)])) AS g FROM w),
      |bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |mb AS (SELECT doc_id, MAX(c) AS mc2 FROM bc GROUP BY 1)
      |SELECT n.doc_id, n_words,
      |  CAST(mc AS DOUBLE) / n_words AS frac_top_word,
      |  COALESCE(CAST(mc2 AS DOUBLE) / GREATEST(n_words - 1, 1), 0.0) AS frac_top_bigram
      |FROM n JOIN mw USING (doc_id) LEFT JOIN mb USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q60
  def redactPii(s: SparkSession, dir: String): DataFrame =
    TextStats.redactPii(docs(s, dir)).orderBy("doc_id")

  val redactPiiSql: String = {
    // same patterns, same order; DuckDB needs the 'g' flag where Spark
    // replaces globally by default. SQL single-quoted strings keep
    // backslashes literally in DuckDB, so the pattern text is identical.
    val stages = TextStats.PiiPatterns.zipWithIndex
    val inner = stages.foldLeft("SELECT doc_id, text AS r0 FROM documents") {
      case (sub, ((name, pat, repl), i)) =>
        s"""SELECT *,
           |  len(regexp_extract_all(r$i, '$pat')) AS n_$name,
           |  regexp_replace(r$i, '$pat', '$repl', 'g') AS r${i + 1}
           |FROM ($sub)""".stripMargin
    }
    s"""SELECT doc_id, ${stages.map { case ((n, _, _), _) => s"n_$n" }.mkString(", ")},
       |  md5(r${stages.size}) AS redacted_md5
       |FROM ($inner) ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q49
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    TextStats.tokenCounts(docs(s, dir)).orderBy("doc_id")

  val tokenCountsSql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS regex_tokens,
      |  length(text) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q50
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    TextStats.fingerprints(docs(s, dir)).orderBy("doc_id")

  val fingerprintsSql: String = {
    val h = TextStats.polyHash(k => s"cps[i + $k]")
    s"""SELECT doc_id, len(fps) AS n_fingerprints,
       |  list_min(fps) AS min_fingerprint, list_max(fps) AS max_fingerprint
       |FROM (SELECT doc_id,
       |  CASE WHEN len(cps) < 8 THEN CAST([] AS BIGINT[])
       |  ELSE list_filter(list_transform(generate_series(1, len(cps) - 7),
       |         i -> $h), x -> x % 16 = 0)
       |  END AS fps FROM (
       |    SELECT doc_id,
       |      list_transform(string_split(text, ''), c -> ascii(c)) AS cps
       |    FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q51
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(s, Multimodal.asMediaTable(docs(s, dir)))
      .toDF().orderBy("doc_id")

  val multimodalFeaturesSql: String =
    """SELECT doc_id, 'image/png' AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS checksum,
      |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
      |  CAST(octet_length(encode(text)) % 480 AS INT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** DuckDB raw (unrounded) cosine — bit-identical to the Spark side:
    * each element promotes to DOUBLE BEFORE the multiply (a float
    * product loses the low bits Spark's double product keeps), then
    * the same left-to-right fold and division order. */
  private def rawCosSql(a: String, b: String): String = {
    def dotD(x: String, y: String) =
      s"CAST(list_sum(list_transform(generate_series(1, len($x)), " +
        s"i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE))) AS DOUBLE)"
    s"(${dotD(a, b)} / sqrt(${dotD(a, a)}) / sqrt(${dotD(b, b)}))"
  }

  /** DuckDB cosine between two DOUBLE[] expressions, rounded like the
    * Spark side. */
  private def cosSql(a: String, b: String): String =
    s"round(${rawCosSql(a, b)}, 6)"

  /** The q46 random-hyperplane bucket expression over a DOUBLE[] `v`
    * (def, not val: referenced by oracle strings declared earlier in
    * the object — a val would still be null during their init). */
  private def bucketSql: String = (0 until 8).map { p =>
    s"(CASE WHEN CAST(list_sum(list_transform(generate_series(1, len(v)), " +
      s"j -> v[j] * (CASE WHEN substr(md5('$p|' || CAST(j - 1 AS VARCHAR)), 1, 1) < '8' " +
      s"THEN -1.0 ELSE 1.0 END))) AS DOUBLE) > 0 THEN '1' ELSE '0' END)"
  }.mkString(" || ")

  // ---------------------------------------------------------------- q52
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame =
    // 0.35 sits in the upper tail of the synthetic embeddings' cosine
    // distribution (within-bucket max ~0.44) — high enough to mean
    // "near-dup", low enough to yield pairs at every SF
    Similarity.embeddingNearDupPairs(emb(s, dir), threshold = 0.35, nPlanes = 8)
      .orderBy("a", "b")

  val embeddingNearDupSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, $bucketSql AS bucket FROM e),
       |pairs AS (
       |  SELECT l.vec_id AS a, r.vec_id AS b, ${cosSql("l.v", "r.v")} AS cos_sim
       |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
       |SELECT a, b, cos_sim FROM pairs WHERE cos_sim >= 0.35 ORDER BY a, b""".stripMargin

  // ---------------------------------------------------------------- q53
  def ivfTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(emb(s, dir), knnQueryIds, k = 5, nprobe = 2, centStride = 100)
      .orderBy("query_id", "rank")

  val ivfTopKSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, v AS ce FROM e WHERE vec_id % 100 = 0),
       |assigned AS (
       |  SELECT vec_id, v, cent_id FROM (
       |    SELECT e.vec_id, e.v, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.v", "c.ce")} DESC, c.cent_id) AS rn
       |    FROM e CROSS JOIN cents c) WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, qe, cent_id FROM (
       |    SELECT q.vec_id AS query_id, q.v AS qe, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosSql("q.v", "c.ce")} DESC, c.cent_id) AS rn
       |    FROM e q CROSS JOIN cents c WHERE q.vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 2),
       |scored AS (
       |  SELECT p.query_id, a.vec_id, ${cosSql("p.qe", "a.v")} AS cos_sim
       |  FROM assigned a JOIN probes p USING (cent_id) WHERE a.vec_id <> p.query_id)
       |SELECT query_id, rank, vec_id, cos_sim FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, vec_id) AS rank FROM scored)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q57
  /** The bucketed-index IVF read path under the same oracle as q53:
    * build the cent_id-bucketed index table, then probe it. The
    * per-query cost is an index WRITE plus a bucket-pruned scan of
    * nprobe cells — at 100 TB the write amortizes over every probe
    * batch while q53 recomputes the assignment per call. Results are
    * pinned equal to the direct path (PlanShapeSpec), so the oracle SQL
    * is identical. */
  def ivfTopKIndexed(s: SparkSession, dir: String): DataFrame = {
    Similarity.writeIvfIndex(emb(s, dir), "graft_ivf_index", nBuckets = 8,
      centStride = 100)
    Similarity.ivfTopKIndexed(s, "graft_ivf_index", emb(s, dir), knnQueryIds,
      k = 5, nprobe = 2, centStride = 100)
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------- q239
  /** INDEX STALENESS DEFENSE ([[graft.llm.IndexStamp]], round-17): the
    * IVF index is built over a PARTIAL corpus crawl, the corpus is
    * then re-crawled in place (every file rewritten), and the indexed
    * read MUST refuse loudly — the corpus content fingerprint stamped
    * on the index at build no longer matches, and a silent answer
    * would miss every newly-crawled vector. The refusal is asserted
    * in-query (q237-style guard); the index is then rebuilt over the
    * CURRENT corpus and served. The oracle is the same exact IVF
    * recomputation as q57 over the final corpus, so an answer computed
    * from the stale v1 index would hash-fail the gate, not just lose
    * recall. */
  private val staleCorpusDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ivfStaleRebuild(s: SparkSession, dir: String): DataFrame = {
    val tmp = staleCorpusDirs.computeIfAbsent(dir, _ =>
      java.nio.file.Files.createTempDirectory("graft-ivf-stale").toString)
    val corpusPath = s"$tmp/corpus.parquet"
    // v1: a partial crawl (keeps the stride-centroid ids — 100n ≡ 3
    // (mod 7) only for n ≡ 5 (mod 7), so most cells keep their seed)
    emb(s, dir).filter(col("vec_id") % 7 =!= 3)
      .write.mode("overwrite").parquet(corpusPath)
    Similarity.writeIvfIndex(s.read.parquet(corpusPath), "graft_ivf_stale",
      nBuckets = 8, centStride = 100)
    // the re-crawl: same path, every file rewritten, new ids appear
    emb(s, dir).write.mode("overwrite").parquet(corpusPath)
    val v2 = s.read.parquet(corpusPath)
    val refused =
      try {
        Similarity.ivfTopKIndexed(s, "graft_ivf_stale", v2, knnQueryIds,
          k = 5, nprobe = 2, centStride = 100).collect()
        false
      } catch {
        case e: IllegalStateException if e.getMessage.contains("STALE") =>
          true
      }
    require(refused,
      "a stale IVF index read did not refuse after the corpus moved")
    Similarity.writeIvfIndex(v2, "graft_ivf_stale", nBuckets = 8,
      centStride = 100)
    Similarity.ivfTopKIndexed(s, "graft_ivf_stale", v2, knnQueryIds,
      k = 5, nprobe = 2, centStride = 100)
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------- q58
  /** int8 quantization summarized to scalars per vector (driver-hash
    * convention, as q50: list columns stay out of the gate output; the
    * l1/min/max triple pins every element's value through the sum). */
  def quantizeEmbeddings(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(emb(s, dir))
      .select(col("vec_id"), col("n_dims"), col("scale"),
        expr("CAST(aggregate(qvec, 0L, (acc, q) -> acc + abs(q)) AS BIGINT)")
          .as("q_l1"),
        expr("array_min(qvec)").as("q_min"),
        expr("array_max(qvec)").as("q_max"),
        col("max_abs_err"))
      .orderBy("vec_id")

  val quantizeEmbeddingsSql: String =
    """SELECT vec_id, len(qvec) AS n_dims, scale,
      |  CAST(list_sum(list_transform(qvec, q -> abs(q))) AS BIGINT) AS q_l1,
      |  list_min(qvec) AS q_min, list_max(qvec) AS q_max,
      |  list_max(list_transform(range(1, len(v) + 1),
      |    i -> abs(v[CAST(i AS INT)] - qvec[CAST(i AS INT)] * scale))) AS max_abs_err
      |FROM (
      |  SELECT vec_id, v, scale,
      |    list_transform(v, x -> CASE WHEN scale = 0.0 THEN 0
      |      ELSE CAST(round(x / scale) AS INT) END) AS qvec
      |  FROM (
      |    SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      |    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)))
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q54
  /** The whole dedup ladder as one call: per-doc keep/drop verdicts
    * (normalized collapse -> LSH candidates -> Jaccard verify). */
  def dedupCorpus(s: SparkSession, dir: String): DataFrame =
    // the scale-correct call shape: the hook materializes each shared
    // slice once (t12, survivors, buckets) so the dominant scan runs 1x,
    // not per branch; results are bit-identical to the lazy path
    // (pinned by LlmOpsSpec "materialize hook preserves results")
    Dedup.dedupCorpus(docs(s, dir), threshold = 0.5, maxBucket = 1000,
        materialize = _.localCheckpoint())
      .select(col("doc_id"), col("keep"), col("drop_reason"), col("lsh_overflow"))
      .orderBy("doc_id")

  val dedupCorpusSql: String =
    s"""WITH canon AS (
       |  SELECT doc_id, text, md5(trim(regexp_replace(regexp_replace(lower(text),
       |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS canon_hash
       |  FROM documents),
       |keepc AS (SELECT canon_hash, MIN(doc_id) AS canon_keep_id
       |          FROM canon GROUP BY 1),
       |t12 AS (SELECT c.doc_id, c.text, c.doc_id <> k.canon_keep_id AS normalized_dup
       |        FROM canon c JOIN keepc k USING (canon_hash)),
       |surv AS (SELECT doc_id, text FROM t12 WHERE NOT normalized_dup),
       |${lshCandidateCtes("surv")},
       |ws AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS w FROM surv),
       |nd AS (
       |  SELECT DISTINCT cand.b AS doc_id
       |  FROM cand
       |  JOIN ws wa ON wa.doc_id = cand.a
       |  JOIN ws wb ON wb.doc_id = cand.b
       |  WHERE CAST(len(list_intersect(wa.w, wb.w)) AS DOUBLE) /
       |    (len(wa.w) + len(wb.w) - len(list_intersect(wa.w, wb.w))) >= 0.5),
       |ovf AS (SELECT DISTINCT doc_id FROM banded
       |        JOIN wide USING (band, bucket))
       |SELECT t12.doc_id,
       |  (NOT normalized_dup AND nd.doc_id IS NULL) AS keep,
       |  CASE WHEN normalized_dup THEN 'normalized_dup'
       |       WHEN nd.doc_id IS NOT NULL THEN 'near_dup' END AS drop_reason,
       |  (o.doc_id IS NOT NULL) AS lsh_overflow
       |FROM t12 LEFT JOIN nd USING (doc_id)
       |LEFT JOIN ovf o USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Test-set decontamination: eval slice = every 50th doc; training
    * docs flagged when they share any word 5-gram with the eval set. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    CorpusOps.decontaminate(
      d.filter(col("doc_id") % 50 =!= 0),
      d.filter(col("doc_id") % 50 === 0), n = 5)
      .orderBy("doc_id")
  }

  val decontaminateSql: String =
    """WITH g AS (SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(string_split(text, ' ')) < 5 THEN [text]
      |    ELSE list_transform(generate_series(1, len(string_split(text, ' ')) - 4),
      |           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 4), ' '))
      |    END)) AS g FROM documents),
      |eg AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0),
      |hits AS (SELECT doc_id, COUNT(*) AS c FROM g JOIN eg USING (g)
      |         WHERE doc_id % 50 <> 0 GROUP BY 1)
      |SELECT d.doc_id, CAST(COALESCE(c, 0) AS BIGINT) AS n_shared_ngrams,
      |  COALESCE(c, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN hits USING (doc_id)
      |WHERE d.doc_id % 50 <> 0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q104
  /** Bloom-prefiltered decontamination: same flag semantics as q62 but
    * through [[CorpusOps.decontaminateBloom]] — sketch probe first,
    * exact verify join over only the bloom hits. Different slice
    * (every 37th doc is eval) and gram width (7) so the two queries
    * exercise the operator on distinct inputs. Output is EXACT (the
    * verify join strips bloom false positives), so the oracle is the
    * plain n-gram-join SQL with no bloom anywhere. */
  def bloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    CorpusOps.decontaminateBloom(
      d.filter(col("doc_id") % 37 =!= 0),
      d.filter(col("doc_id") % 37 === 0), n = 7)
      .orderBy("doc_id")
  }

  val bloomDecontaminateSql: String =
    """WITH g AS (SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(string_split(text, ' ')) < 7 THEN [text]
      |    ELSE list_transform(generate_series(1, len(string_split(text, ' ')) - 6),
      |           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 6), ' '))
      |    END)) AS g FROM documents),
      |eg AS (SELECT DISTINCT g FROM g WHERE doc_id % 37 = 0),
      |hits AS (SELECT doc_id, COUNT(*) AS c FROM g JOIN eg USING (g)
      |         WHERE doc_id % 37 <> 0 GROUP BY 1)
      |SELECT d.doc_id, CAST(COALESCE(c, 0) AS BIGINT) AS n_shared_ngrams,
      |  COALESCE(c, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN hits USING (doc_id)
      |WHERE d.doc_id % 37 <> 0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q63
  def hashSplit(s: SparkSession, dir: String): DataFrame =
    CorpusOps.hashSplit(docs(s, dir), trainPct = 96, valPct = 2).orderBy("doc_id")

  val hashSplitSql: String =
    """SELECT doc_id, bucket,
      |  CASE WHEN bucket < 96 THEN 'train' WHEN bucket < 98 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (SELECT doc_id,
      |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100
      |    AS bucket FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q64
  def topTerms(s: SparkSession, dir: String): DataFrame =
    CorpusOps.topTerms(docs(s, dir), k = 10).orderBy("source", "rank")

  val topTermsSql: String =
    """WITH tfc AS (SELECT source, term, COUNT(*) AS tf
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term
      |        FROM documents) GROUP BY 1, 2),
      |dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
      |ns AS (SELECT COUNT(DISTINCT source) AS ns FROM documents)
      |SELECT source, rank, term, tf, df, score FROM (
      |  SELECT source, term, tf, df, CAST(tf * ns AS DOUBLE) / df AS score,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY CAST(tf * ns AS DOUBLE) / df DESC, term) AS rank
      |  FROM tfc JOIN dfc USING (term) CROSS JOIN ns)
      |WHERE rank <= 10 ORDER BY source, rank""".stripMargin

  // ---------------------------------------------------------------- q186
  /** Frequency-ordered dense codes for the `source` column with exact
    * ppm coverage ([[CorpusOps.categoryCodebook]]) — the StringIndexer
    * step under the gate. */
  def categoryCodebook(s: SparkSession, dir: String): DataFrame =
    CorpusOps.categoryCodebook(docs(s, dir), "source").orderBy("code")

  val categoryCodebookSql: String =
    """WITH f AS (SELECT source, COUNT(*) AS freq FROM documents GROUP BY 1)
      |SELECT source,
      |  CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, source) - 1 AS BIGINT)
      |    AS code,
      |  CAST(freq AS BIGINT) AS freq,
      |  (1000000 * CAST(SUM(freq) OVER (ORDER BY freq DESC, source
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
      |    // CAST(SUM(freq) OVER () AS BIGINT) AS cum_ppm
      |FROM f ORDER BY code""".stripMargin

  // ---------------------------------------------------------------- q187
  /** Hashing-trick features ([[CorpusOps.featureHash]], HashingTF):
    * 64 md5-prefix buckets per doc, sparse (doc, bucket, count) form —
    * vocabulary-free fixed-width features, the oracle re-derives the
    * identical hash. */
  def featureHashBuckets(s: SparkSession, dir: String): DataFrame =
    CorpusOps.featureHash(docs(s, dir), d = 64).orderBy("doc_id", "bucket")

  val featureHashBucketsSql: String =
    """SELECT doc_id,
      |  CAST('0x' || substr(md5(term), 1, 6) AS BIGINT) % 64 AS bucket,
      |  COUNT(*) AS cnt
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |      FROM documents)
      |GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin

  // ---------------------------------------------------------------- q65
  def packSequences(s: SparkSession, dir: String): DataFrame =
    CorpusOps.packSequences(docs(s, dir), capacity = 512, shards = 8)
      .orderBy("doc_id")

  val packSequencesSql: String =
    """SELECT doc_id, lang, shard, n_tokens,
      |  CAST(floor((running - n_tokens) / 512.0) AS BIGINT) AS bin,
      |  (running - n_tokens) % 512 AS start_offset
      |FROM (
      |  SELECT doc_id, lang, doc_id % 8 AS shard,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    CAST(SUM(len(string_split(text, ' '))) OVER (
      |      PARTITION BY lang, doc_id % 8 ORDER BY doc_id) AS BIGINT) AS running
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q66
  /** Two Lloyd iterations from the stride init; see
    * [[Similarity.kmeansAssign]] for the determinism contract (6 dp
    * rounding, decimal component sums, unnormalized centroids). */
  def kmeansClusters(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansAssign(emb(s, dir), iters = 2, centStride = 100,
        materialize = _.localCheckpoint())
      .orderBy("vec_id")

  /** The q66 two-iteration Lloyd assignment as shared CTEs (`asg` =
    * final (vec_id, cent_id, cent_sim)) — q66 and q180 both derive
    * from this one definition so the clustering they certify can
    * never silently diverge. */
  private def kmeansAssignCtes: String =
    s"""e AS (SELECT vec_id,
       |  list_transform(CAST(embedding AS DOUBLE[]), x -> round(x, 6)) AS v
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cent_id, v AS ce FROM e WHERE vec_id % 100 = 0),
       |a1 AS (SELECT vec_id, v, cent_id FROM (
       |  SELECT e.vec_id, e.v, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosSql("e.v", "c.ce")} DESC, c.cent_id) AS rn
       |  FROM e CROSS JOIN c0 c) WHERE rn = 1),
       |s1 AS (SELECT cent_id, i AS pos, SUM(CAST(v[i] AS DECIMAL(18,6))) AS s
       |       FROM a1, unnest(generate_series(1, len(v))) AS t(i) GROUP BY 1, 2),
       |c1 AS (SELECT cent_id, list(CAST(s AS DOUBLE) ORDER BY pos) AS ce
       |       FROM s1 GROUP BY 1),
       |asg AS (SELECT vec_id, cent_id, cent_sim FROM (
       |  SELECT e.vec_id, c.cent_id, ${cosSql("e.v", "c.ce")} AS cent_sim,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosSql("e.v", "c.ce")} DESC, c.cent_id) AS rn
       |  FROM e CROSS JOIN c1 c) WHERE rn = 1)""".stripMargin

  val kmeansClustersSql: String =
    s"""WITH $kmeansAssignCtes
       |SELECT vec_id, cent_id, cent_sim FROM asg ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q180
  /** Cluster LABELING — the step that makes unsupervised clusters
    * readable: per-k-means-cluster TF-IDF top terms (q66's assignment
    * × q64's scoring), joining embeddings to their documents on the
    * aligned vec_id = doc_id. The label of a cluster is its 3 most
    * over-represented terms. Scale shape: the assignment is
    * metadata-per-vector, the join is co-keyed, and the term scoring
    * inherits q64's vocab-scale discipline (corpus text never
    * shuffles twice). */
  def clusterTopTerms(s: SparkSession, dir: String): DataFrame = {
    val asg = Similarity.kmeansAssign(emb(s, dir), iters = 2, centStride = 100,
        materialize = _.localCheckpoint())
      .select(col("vec_id"), col("cent_id"))
    val byCluster = docs(s, dir)
      .join(asg, col("doc_id") === col("vec_id"))
      // CorpusOps.topTerms groups on `source`: the cluster id IS the
      // source dimension here
      .select(col("cent_id").cast("string").as("source"), col("text"))
    CorpusOps.topTerms(byCluster, k = 3)
      .select(col("source").cast("long").as("cent_id"), col("rank"),
        col("term"), col("tf"), col("df"), col("score"))
      .orderBy("cent_id", "rank")
  }

  val clusterTopTermsSql: String =
    s"""WITH $kmeansAssignCtes,
       |cd AS (SELECT a.cent_id, d.text FROM asg a
       |       JOIN documents d ON d.doc_id = a.vec_id),
       |tfc AS (SELECT cent_id, term, COUNT(*) AS tf FROM (
       |    SELECT cent_id, unnest(string_split(text, ' ')) AS term FROM cd)
       |  GROUP BY 1, 2),
       |dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
       |ns AS (SELECT COUNT(DISTINCT cent_id) AS ns FROM cd)
       |SELECT cent_id, rank, term, tf, df, score FROM (
       |  SELECT cent_id, term, tf, df, CAST(tf * ns AS DOUBLE) / df AS score,
       |    ROW_NUMBER() OVER (PARTITION BY cent_id
       |      ORDER BY CAST(tf * ns AS DOUBLE) / df DESC, term) AS rank
       |  FROM tfc JOIN dfc USING (term) CROSS JOIN ns)
       |WHERE rank <= 3 ORDER BY cent_id, rank""".stripMargin

  // ---------------------------------------------------------------- q67
  /** Duplicated 8-gram fraction per doc (RefinedWeb-style boilerplate
    * screen): a gram is "shared" when ≥ 2 docs contain it. */
  def dupNgrams(s: SparkSession, dir: String): DataFrame =
    CorpusOps.dupNgramStats(docs(s, dir), n = 8, maxDupFrac = 0.3,
        materialize = _.localCheckpoint())
      .orderBy("doc_id")

  val dupNgramsSql: String =
    """WITH g AS (SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(string_split(text, ' ')) < 8 THEN [text]
      |    ELSE list_transform(generate_series(1, len(string_split(text, ' ')) - 7),
      |           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 7), ' '))
      |    END)) AS g FROM documents),
      |sh AS (SELECT g, MIN(doc_id) <> MAX(doc_id) AS shared FROM g GROUP BY 1)
      |SELECT doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN shared THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
      |  CAST(SUM(CASE WHEN shared THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
      |    AS dup_frac,
      |  CAST(SUM(CASE WHEN shared THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
      |    <= 0.3 AS keep
      |FROM g JOIN sh USING (g) GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q68
  /** Fixed-weight linear quality model; see
    * [[CorpusOps.qualityScore]] for the bit-exactness contract (IEEE
    * +,*,/ only, fixed evaluation order, no transcendentals). */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    CorpusOps.qualityScore(docs(s, dir), threshold = 1.0).orderBy("doc_id")

  val qualityScoreSql: String =
    """SELECT doc_id, CAST(n AS INTEGER) AS n_words,
      |  ml AS mean_word_len, sr AS stopword_ratio, dr AS distinct_ratio,
      |  2e-3 * n + 2e0 * sr + 1.5e0 * dr - 1e-1 * ml AS quality_score,
      |  2e-3 * n + 2e0 * sr + 1.5e0 * dr - 1e-1 * ml >= 1e0 AS keep
      |FROM (SELECT doc_id, n,
      |    (CAST(length(text) AS DOUBLE) - n + 1e0) / n AS ml,
      |    CAST(len(list_filter(ws, w -> list_contains(
      |      ['the','a','of','and','to','in','is'], w))) AS DOUBLE) / n AS sr,
      |    CAST(len(list_distinct(ws)) AS DOUBLE) / n AS dr
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws,
      |          CAST(len(string_split(text, ' ')) AS DOUBLE) AS n
      |        FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q69
  /** Token-budget corpus mixing: 800 tokens per source over 8 hash
    * shards (100/shard), md5-priority order. */
  def tokenBudgetSample(s: SparkSession, dir: String): DataFrame =
    CorpusOps.tokenBudgetSample(docs(s, dir), budgetPerSource = 800,
      shards = 8).orderBy("doc_id")

  val tokenBudgetSampleSql: String =
    """SELECT doc_id, source, shard, n_tokens, priority,
      |  running, running <= 100 AS sampled
      |FROM (SELECT *, CAST(SUM(n_tokens) OVER (
      |    PARTITION BY source, shard ORDER BY priority, doc_id) AS BIGINT)
      |    AS running
      |  FROM (SELECT doc_id, source, doc_id % 8 AS shard,
      |      len(string_split(text, ' ')) AS n_tokens,
      |      md5(CAST(doc_id AS VARCHAR)) AS priority FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q70
  /** Incremental corpus update: docs with doc_id % 10 ∈ {8, 9} arrive
    * as the new batch, the rest are the prior snapshot. */
  def snapshotDelta(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    CorpusOps.snapshotDelta(
      d.filter(col("doc_id") % 10 >= 8),
      d.filter(col("doc_id") % 10 < 8))
      .orderBy("doc_id")
  }

  val snapshotDeltaSql: String =
    """WITH nb AS (SELECT doc_id, md5(text) AS content_hash
      |            FROM documents WHERE doc_id % 10 >= 8),
      |snap AS (SELECT DISTINCT md5(text) AS content_hash
      |         FROM documents WHERE doc_id % 10 < 8),
      |bk AS (SELECT content_hash, MIN(doc_id) AS batch_keep_id
      |       FROM nb GROUP BY 1)
      |SELECT nb.doc_id, nb.content_hash,
      |  (snap.content_hash IS NULL AND nb.doc_id = bk.batch_keep_id) AS keep,
      |  CASE WHEN snap.content_hash IS NOT NULL THEN 'in_snapshot'
      |       WHEN nb.doc_id <> bk.batch_keep_id THEN 'batch_dup' END
      |    AS drop_reason
      |FROM nb JOIN bk USING (content_hash) LEFT JOIN snap USING (content_hash)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q71
  /** Minhash Jaccard ESTIMATES for the q42 candidate pairs — the
    * sketch tier between banding and exact verification. */
  def minhashJaccardEst(s: SparkSession, dir: String): DataFrame =
    Dedup.estimatedJaccardPairs(docs(s, dir), k = 8, bands = 4,
      shingle = 3, maxBucket = 1000,
      materialize = _.localCheckpoint()).orderBy("a", "b")

  val minhashJaccardEstSql: String = {
    val agree = (0 until 8)
      .map(i => s"(CASE WHEN l.mh$i = r.mh$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH ${lshCandidateCtes("documents")}
       |SELECT a, b, k_agree, CAST(k_agree AS DOUBLE) / 8 AS est_jaccard
       |FROM (SELECT c.a, c.b, $agree AS k_agree
       |      FROM cand c JOIN sig l ON c.a = l.doc_id
       |      JOIN sig r ON c.b = r.doc_id)
       |ORDER BY a, b""".stripMargin
  }

  // ---------------------------------------------------------------- q72
  def wordRarity(s: SparkSession, dir: String): DataFrame =
    CorpusOps.wordRarity(docs(s, dir), materialize = _.localCheckpoint())
      .orderBy("doc_id")

  val wordRaritySql: String =
    """WITH wx AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
      |            AS w FROM documents),
      |dfc AS (SELECT w, COUNT(*) AS df FROM wx GROUP BY 1),
      |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      |agg AS (SELECT doc_id, COUNT(*) AS n_distinct_words,
      |          CAST(SUM(df) AS BIGINT) AS sum_df
      |        FROM wx JOIN dfc USING (w) GROUP BY 1)
      |SELECT doc_id, n_distinct_words,
      |  CAST(sum_df AS DOUBLE) / n_distinct_words AS mean_df,
      |  CAST(sum_df AS DOUBLE) / n_distinct_words / n_docs AS commonness
      |FROM agg CROSS JOIN nd ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q77
  /** Duplicate-span removal at word-8-gram granularity; one canonical
    * copy of every cross-document span survives. */
  def trimSharedSpans(s: SparkSession, dir: String): DataFrame =
    CorpusOps.trimSharedSpans(docs(s, dir), n = 8,
        materialize = _.localCheckpoint())
      .orderBy("doc_id")

  val trimSharedSpansSql: String =
    """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws
      |           FROM documents),
      |g AS (SELECT doc_id, i AS pos,
      |        array_to_string(list_slice(ws, i, i + 7), ' ') AS g
      |      FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
      |      WHERE len(ws) >= 8),
      |k AS (SELECT g, MIN(doc_id) AS keep_doc,
      |        MIN(doc_id) <> MAX(doc_id) AS shared FROM g GROUP BY 1),
      |cov AS (SELECT DISTINCT doc_id, pos + j AS wpos
      |        FROM g JOIN k USING (g),
      |             unnest(generate_series(0, 7)) AS t(j)
      |        WHERE shared AND doc_id <> keep_doc),
      |wp AS (SELECT doc_id, i AS wpos, ws[i] AS w
      |       FROM w, unnest(generate_series(1, len(ws))) AS t(i)),
      |kept AS (SELECT wp.doc_id, wp.wpos, wp.w FROM wp
      |         LEFT JOIN cov ON cov.doc_id = wp.doc_id AND cov.wpos = wp.wpos
      |         WHERE cov.doc_id IS NULL),
      |reb AS (SELECT doc_id, string_agg(w, ' ' ORDER BY wpos) AS trimmed_text,
      |          COUNT(*) AS n_kept FROM kept GROUP BY 1)
      |SELECT d.doc_id, CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_words,
      |  CAST(COALESCE(n_kept, 0) AS INTEGER) AS n_kept,
      |  CAST(len(string_split(d.text, ' ')) - COALESCE(n_kept, 0) AS INTEGER)
      |    AS n_removed,
      |  COALESCE(trimmed_text, '') AS trimmed_text
      |FROM documents d LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q105
  /** Exact longest shared word-span per doc pair (suffix-array dedup
    * metric, relational form) — see [[CorpusOps.longestSharedSpans]].
    * n=8 grams, spans >= 12 words reported, boilerplate grams (df>50)
    * excluded on both engines. */
  def longestSharedSpans(s: SparkSession, dir: String): DataFrame =
    CorpusOps.longestSharedSpans(docs(s, dir), n = 8, minSpan = 12,
        maxDf = 50, materialize = _.localCheckpoint())
      .orderBy("a", "b")

  val longestSharedSpansSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, i AS pos,
      |        array_to_string(list_slice(ws, i, i + 7), ' ') AS g
      |      FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
      |      WHERE len(ws) >= 8),
      |el AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS df
      |                      FROM g GROUP BY 1) WHERE df BETWEEN 2 AND 50),
      |m AS (SELECT DISTINCT ga.doc_id AS a, gb.doc_id AS b,
      |        ga.pos - gb.pos AS diag, ga.pos AS pa
      |      FROM g ga JOIN el ON ga.g = el.g
      |      JOIN g gb ON ga.g = gb.g AND ga.doc_id < gb.doc_id),
      |r AS (SELECT a, b, diag, pa,
      |        pa - ROW_NUMBER() OVER (PARTITION BY a, b, diag ORDER BY pa)
      |          AS island FROM m),
      |runs AS (SELECT a, b, COUNT(*) + 7 AS span FROM r
      |         GROUP BY a, b, diag, island)
      |SELECT a, b, CAST(MAX(span) AS BIGINT) AS longest_span,
      |  CAST(SUM(CASE WHEN span >= 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
      |FROM runs GROUP BY a, b HAVING MAX(span) >= 12
      |ORDER BY a, b""".stripMargin

  // ---------------------------------------------------------------- q82
  /** Deterministic stratified sample: 50% of English, 30% of Chinese,
    * 10% of everything else, decided per-doc by salted md5 — see
    * [[CorpusOps.stratifiedSample]] (zero-shuffle filter). */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    CorpusOps.stratifiedSample(docs(s, dir),
        rates = Map("en" -> 0.5, "zh" -> 0.3), defaultRate = 0.1)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  val stratifiedSampleSql: String = {
    val (en, zh, other) = (CorpusOps.hexThreshold(0.5),
      CorpusOps.hexThreshold(0.3), CorpusOps.hexThreshold(0.1))
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 12) <
       |  CASE lang WHEN 'en' THEN '$en' WHEN 'zh' THEN '$zh'
       |       ELSE '$other' END
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q78
  def sourceHealth(s: SparkSession, dir: String): DataFrame =
    CorpusOps.sourceHealth(docs(s, dir)).orderBy("source")

  val sourceHealthSql: String =
    """WITH m AS (SELECT source, n_chars,
      |    len(string_split(text, ' ')) AS nw,
      |    len(list_filter(string_split(text, ' '), w -> list_contains(
      |      ['the','a','of','and','to','in','is'], w))) AS stop_hits,
      |    len(list_distinct(string_split(text, ' '))) AS dw
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(nw) AS BIGINT) AS total_words,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(CAST(SUM(CASE WHEN nw >= 20 AND nw <= 200
      |        AND CAST(stop_hits AS DOUBLE) / nw < 0.5 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS DOUBLE) / COUNT(*) AS quality_rate,
      |  CAST(SUM(CASE WHEN CAST(dw AS DOUBLE) / nw < 0.3 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_repetitive,
      |  CAST(SUM(CASE WHEN stop_hits = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_no_stopwords,
      |  CAST(CAST(SUM(nw) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_words
      |FROM m GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q90
  /** Index-quality evaluation: recall@10 of the two ANN paths (IVF
    * cell probe, hyperplane-LSH bucket) against the exact cosine
    * top-10 — the eval loop every production ANN deployment runs
    * before trusting an index. All three searches share one corpus;
    * the recall join runs at (queries x k) scale — driver-free,
    * metadata-sized. */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    // the exact ranking is the DOMINANT brute-force scan and feeds four
    // branches (nex + hits, per method) — checkpoint its queries×k-row
    // output so the scan runs once (the Dedup.dedupCorpus hook pattern)
    val exact = Similarity.cosineTopK(e, knnQueryIds, k = 10)
      .select(col("query_id"), col("vec_id"))
      .localCheckpoint()
    def recallOf(method: String, approx: DataFrame): DataFrame = {
      val nex = exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      val hits = exact
        .join(approx.select(col("query_id"), col("vec_id")),
          Seq("query_id", "vec_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      nex.join(hits, Seq("query_id"), "left")
        .select(lit(method).as("method"), col("query_id"), col("n_exact"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_exact"))
            .as("recall"))
    }
    recallOf("ivf",
        Similarity.ivfTopK(e, knnQueryIds, k = 10, nprobe = 2, centStride = 100))
      .unionByName(recallOf("lsh_bucket",
        Similarity.annTopKInBucket(e, knnQueryIds, k = 10, nPlanes = 8)))
      .orderBy("method", "query_id")
  }

  val annRecallSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qe FROM e
       |      WHERE vec_id IN (0, 1, 2, 3, 4)),
       |ex AS (SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cs DESC, vec_id) AS rank
       |    FROM (SELECT query_id, vec_id, ${cosSql("qe", "v")} AS cs
       |          FROM e CROSS JOIN q WHERE vec_id <> query_id))
       |  WHERE rank <= 10),
       |b AS (SELECT vec_id, v, $bucketSql AS bucket FROM e),
       |qb AS (SELECT vec_id AS query_id, v AS qe, bucket FROM b
       |       WHERE vec_id IN (0, 1, 2, 3, 4)),
       |lsh AS (SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cs DESC, vec_id) AS rank
       |    FROM (SELECT query_id, b.vec_id AS vec_id,
       |            ${cosSql("qe", "b.v")} AS cs
       |          FROM b JOIN qb USING (bucket) WHERE b.vec_id <> query_id))
       |  WHERE rank <= 10),
       |cents AS (SELECT vec_id AS cent_id, v AS ce FROM e WHERE vec_id % 100 = 0),
       |assigned AS (
       |  SELECT vec_id, v, cent_id FROM (
       |    SELECT e.vec_id, e.v, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.v", "c.ce")} DESC, c.cent_id) AS rn
       |    FROM e CROSS JOIN cents c) WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, qe, cent_id FROM (
       |    SELECT q.query_id, q.qe, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cosSql("q.qe", "c.ce")} DESC, c.cent_id) AS rn
       |    FROM q CROSS JOIN cents c) WHERE rn <= 2),
       |ivf AS (SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cs DESC, vec_id) AS rank
       |    FROM (SELECT p.query_id, a.vec_id, ${cosSql("p.qe", "a.v")} AS cs
       |          FROM assigned a JOIN probes p USING (cent_id)
       |          WHERE a.vec_id <> p.query_id))
       |  WHERE rank <= 10),
       |nex AS (SELECT query_id, COUNT(*) AS n_exact FROM ex GROUP BY 1),
       |res AS (
       |  SELECT 'ivf' AS method, n.query_id, n.n_exact,
       |    COALESCE(h.n_hit, 0) AS n_hit
       |  FROM nex n LEFT JOIN (SELECT query_id, COUNT(*) AS n_hit
       |    FROM ex JOIN ivf USING (query_id, vec_id) GROUP BY 1) h
       |    USING (query_id)
       |  UNION ALL
       |  SELECT 'lsh_bucket' AS method, n.query_id, n.n_exact,
       |    COALESCE(h.n_hit, 0) AS n_hit
       |  FROM nex n LEFT JOIN (SELECT query_id, COUNT(*) AS n_hit
       |    FROM ex JOIN lsh USING (query_id, vec_id) GROUP BY 1) h
       |    USING (query_id))
       |SELECT method, query_id, CAST(n_exact AS BIGINT) AS n_exact,
       |  CAST(n_hit AS BIGINT) AS n_hit,
       |  CAST(n_hit AS DOUBLE) / n_exact AS recall
       |FROM res ORDER BY method, query_id""".stripMargin

  // ---------------------------------------------------------------- q91
  /** Exact heavy hitters via the Misra–Gries screen + exact verify —
    * see [[CorpusOps.heavyHitters]]. The oracle is the plain exact
    * GROUP BY: the sketch guarantee (no false negatives above
    * N/(k+1)) + the exact second pass make the two-phase pipeline
    * bit-identical to it. */
  def heavyHitters(s: SparkSession, dir: String): DataFrame =
    CorpusOps.heavyHitters(docs(s, dir), frac = 0.01, sketchK = 199)

  val heavyHittersSql: String =
    """WITH tok AS (SELECT word FROM (
      |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE word <> ''),
      |tot AS (SELECT COUNT(*) AS n_tokens FROM tok),
      |cnt AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY 1)
      |SELECT word, CAST(n AS BIGINT) AS n,
      |  CAST(n AS DOUBLE) / n_tokens AS freq
      |FROM cnt CROSS JOIN tot
      |WHERE n >= CEIL(n_tokens * 0.01)
      |ORDER BY n DESC, word""".stripMargin

  // ---------------------------------------------------------------- q92
  /** Largest-remainder mixture allocation of a 100k-token budget
    * across sources — see [[CorpusOps.mixtureWeights]] (integer-exact,
    * sums to the budget bit-for-bit). */
  def mixtureWeights(s: SparkSession, dir: String): DataFrame =
    CorpusOps.mixtureWeights(docs(s, dir), budget = 100000L)

  val mixtureWeightsSql: String =
    """WITH st AS (SELECT source,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM st),
      |sc AS (SELECT source, n_tokens, t,
      |    CAST(n_tokens AS HUGEINT) * 100000 AS prod
      |  FROM st CROSS JOIN tot),
      |b AS (SELECT source, n_tokens, t,
      |    prod % CAST(t AS HUGEINT) AS rem,
      |    prod // CAST(t AS HUGEINT) AS base
      |  FROM sc),
      |r AS (SELECT source, n_tokens, t, base,
      |    100000 - CAST(SUM(base) OVER () AS BIGINT) AS leftover,
      |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
      |  FROM b)
      |SELECT source, n_tokens,
      |  CAST(base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS BIGINT)
      |    AS alloc,
      |  CAST(n_tokens AS DOUBLE) / t AS share
      |FROM r ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q110
  /** Per-label embedding centroids (class prototypes) in long format —
    * the dataset-cartography primitive (prototype filtering, slice
    * drift monitoring, nearest-class-mean classifiers). Exactness via
    * the q66 recipe: components rounded to 6 dp once (identical in
    * both engines), summed in DECIMAL(18,6) — order-independent — and
    * divided by the exact count ONCE into a double. Shape: one
    * posexplode shuffle on (label, pos) — rows = corpus x dims as
    * compact numeric triples, partial-aggregated map-side. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("label"),
        posexplode(expr("transform(embedding, x -> round(CAST(x AS DOUBLE), 6))"))
          .as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("x").cast("decimal(18,6)")).cast("double")
          / count(lit(1))).as("c"),
        count(lit(1)).as("n_vecs"))
      .orderBy("label", "pos")

  val labelCentroidsSql: String =
    """SELECT label, i - 1 AS pos,
      |  CAST(SUM(CAST(round(CAST(e AS DOUBLE), 6) AS DECIMAL(18,6))) AS DOUBLE)
      |    / COUNT(*) AS c,
      |  COUNT(*) AS n_vecs
      |FROM (SELECT label, unnest(embedding) AS e,
      |        unnest(generate_series(1, len(embedding))) AS i FROM embeddings)
      |GROUP BY 1, 2 ORDER BY label, pos""".stripMargin

  // ---------------------------------------------------------------- q112
  /** Nearest-class-mean (prototype) classifier evaluation: every
    * vector is assigned to the label whose q110-style centroid it is
    * most cosine-similar to, and the output is the exact confusion
    * matrix (label x predicted_label counts) — the one-pass sanity
    * eval of embedding quality (are classes linearly separated by
    * their means?) run before spending on a real probe.
    *
    * Exactness: centroids via the decimal-exact q110 recipe;
    * similarities as integer micro-units with the q93 discipline
    * (round-6 components, fixed-order fold, `floor(round(x,6)*1e6
    * + 0.5)`), argmax tie-broken on (sim DESC, label ASC) — bit-
    * reproducible under any partitioning and in DuckDB. Shape: the
    * |labels|-row centroid table broadcasts; the corpus side is one
    * narrow map + one partial-aggregable argmax groupBy + the tiny
    * confusion aggregate. */
  def prototypeConfusion(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> round(CAST(x AS DOUBLE), 6))").as("v"))
    val cents = e
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("x").cast("decimal(18,6)")).cast("double")
        / count(lit(1))).as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("ps"))
      .select(col("label").as("cent_label"),
        expr("transform(ps, p -> p.c)").as("ce"))
      .withColumn("nc", Similarity.norm(col("ce")))
    e.withColumn("nv", Similarity.norm(col("v")))
      .join(broadcast(cents))
      .withColumn("sim_us",
        floor(round(Similarity.cosineWithNorms(col("v"), col("ce"),
          col("nv"), col("nc")), 6) * 1e6 + 0.5).cast("long"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max_by(col("cent_label"),
        struct(col("sim_us"), (-col("cent_label")).as("t"))).as("predicted_label"))
      .groupBy(col("label"), col("predicted_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "predicted_label")
  }

  val prototypeConfusionSql: String =
    """WITH e AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS v
      |  FROM embeddings),
      |comp AS (SELECT label, i AS pos,
      |    CAST(SUM(CAST(v[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c
      |  FROM e, unnest(generate_series(1, len(v))) AS t(i) GROUP BY label, i),
      |cent AS (SELECT label AS cent_label, list(c ORDER BY pos) AS ce
      |  FROM comp GROUP BY 1),
      |cn AS (SELECT cent_label, ce,
      |    sqrt(CAST(list_sum(list_transform(ce, x -> x * x)) AS DOUBLE)) AS nc
      |  FROM cent),
      |en AS (SELECT vec_id, label, v,
      |    sqrt(CAST(list_sum(list_transform(v, x -> x * x)) AS DOUBLE)) AS nv
      |  FROM e),
      |sims AS (SELECT vec_id, label, cent_label,
      |    CAST(floor(round(CAST(list_sum(list_transform(generate_series(1, len(v)),
      |      i -> v[i] * ce[i])) AS DOUBLE) / nv / nc, 6) * 1e6 + 0.5) AS BIGINT) AS sim_us
      |  FROM en CROSS JOIN cn),
      |pred AS (SELECT vec_id, label, cent_label AS predicted_label,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id
      |      ORDER BY sim_us DESC, cent_label ASC) AS rn FROM sims)
      |SELECT label, predicted_label, COUNT(*) AS n FROM pred WHERE rn = 1
      |GROUP BY 1, 2 ORDER BY label, predicted_label""".stripMargin

  // ---------------------------------------------------------------- q93
  /** PQ/ADC approximate search — see [[Similarity.pqTopK]] (integer
    * micro-unit distances end-to-end: order-free sums, exact rank
    * parity with the oracle's window formulation). */
  def pqTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(emb(s, dir), knnQueryIds, k = 10, m = 8,
      centStride = 100)

  /** Squared-L2 of subspace `sub` between DOUBLE[] aliases, in integer
    * micro-units — the DuckDB mirror of pqTopK's fixed-order fold. */
  private def pqDUsSql(a: String, b: String): String =
    s"CAST(floor(round(CAST(list_sum(list_transform(generate_series(1, 8), " +
      s"i -> ($a[s.sub*8+i] - $b[s.sub*8+i]) * ($a[s.sub*8+i] - $b[s.sub*8+i])" +
      s")) AS DOUBLE), 6) * 1000000.0 + 0.5) AS BIGINT)"

  val pqTopKSql: String =
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x, 6)) AS v
       |  FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id % 100 = 0),
       |subs AS (SELECT unnest(generate_series(0, 7)) AS sub),
       |encd AS (
       |  SELECT e.vec_id, s.sub, c.cent_id, ${pqDUsSql("e.v", "c.cv")} AS d_us
       |  FROM e CROSS JOIN subs s CROSS JOIN cents c),
       |enc AS (SELECT vec_id, sub, cent_id FROM (
       |    SELECT vec_id, sub, cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub
       |        ORDER BY d_us, cent_id) AS rn
       |    FROM encd) WHERE rn = 1),
       |qd AS (
       |  SELECT e.vec_id AS query_id, s.sub, c.cent_id,
       |    ${pqDUsSql("e.v", "c.cv")} AS d_us
       |  FROM e CROSS JOIN subs s CROSS JOIN cents c
       |  WHERE e.vec_id IN (0, 1, 2, 3, 4)),
       |adc AS (
       |  SELECT q.query_id, enc.vec_id, CAST(SUM(q.d_us) AS BIGINT) AS approx_us
       |  FROM enc JOIN qd q USING (sub, cent_id)
       |  WHERE enc.vec_id <> q.query_id GROUP BY 1, 2)
       |SELECT query_id, CAST(rank AS INT) AS rank, vec_id,
       |  CAST(approx_us AS DOUBLE) / 1000000.0 AS approx_dist
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx_us, vec_id) AS rank FROM adc)
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q120
  /** The composed IVF-PQ serving path: PQ codes at rest PER IVF cell
    * (`Similarity.writeIvfPqIndex` — no float vectors in the table),
    * search = driver-resolved probe cells (literal IN, bucket-pruned
    * scan) then asymmetric distance over the stored codes only. The
    * oracle recomputes the full composition in SQL: raw-vector IVF
    * assignment + probes (as q53/q57), 6dp-rounded PQ codes + ADC (as
    * q93), candidates restricted to each query's probed cells. */
  def ivfPqTopK(s: SparkSession, dir: String): DataFrame = {
    Similarity.writeIvfPqIndex(emb(s, dir), "graft_ivfpq_index", nBuckets = 8,
      centStride = 100, m = 8)
    Similarity.ivfPqTopK(s, "graft_ivfpq_index", emb(s, dir), knnQueryIds,
      k = 5, nprobe = 2, centStride = 100, m = 8)
      .orderBy("query_id", "rank")
  }

  val ivfPqTopKSql: String =
    s"""WITH eraw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, v AS ce FROM eraw WHERE vec_id % 100 = 0),
       |assigned AS (SELECT vec_id, cent_id FROM (
       |    SELECT e.vec_id, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.v", "c.ce")} DESC, c.cent_id) AS rn
       |    FROM eraw e CROSS JOIN cents c) WHERE rn = 1),
       |probes AS (SELECT query_id, cent_id FROM (
       |    SELECT q.vec_id AS query_id, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosSql("q.v", "c.ce")} DESC, c.cent_id) AS rn
       |    FROM eraw q CROSS JOIN cents c WHERE q.vec_id IN (0, 1, 2, 3, 4))
       |  WHERE rn <= 2),
       |epq AS (SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x, 6)) AS v
       |  FROM embeddings),
       |pqc AS (SELECT vec_id AS cent_id, v AS cv FROM epq WHERE vec_id % 100 = 0),
       |subs AS (SELECT unnest(generate_series(0, 7)) AS sub),
       |encd AS (
       |  SELECT e.vec_id, s.sub, c.cent_id, ${pqDUsSql("e.v", "c.cv")} AS d_us
       |  FROM epq e CROSS JOIN subs s CROSS JOIN pqc c),
       |enc AS (SELECT vec_id, sub, cent_id FROM (
       |    SELECT vec_id, sub, cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub
       |        ORDER BY d_us, cent_id) AS rn
       |    FROM encd) WHERE rn = 1),
       |qd AS (
       |  SELECT e.vec_id AS query_id, s.sub, c.cent_id, ${pqDUsSql("e.v", "c.cv")} AS d_us
       |  FROM epq e CROSS JOIN subs s CROSS JOIN pqc c
       |  WHERE e.vec_id IN (0, 1, 2, 3, 4)),
       |cand AS (
       |  SELECT p.query_id, a.vec_id FROM assigned a JOIN probes p USING (cent_id)
       |  WHERE a.vec_id <> p.query_id),
       |adc AS (
       |  SELECT cand.query_id, cand.vec_id, CAST(SUM(q.d_us) AS BIGINT) AS approx_us
       |  FROM cand
       |  JOIN enc ON enc.vec_id = cand.vec_id
       |  JOIN qd q ON q.query_id = cand.query_id
       |    AND q.sub = enc.sub AND q.cent_id = enc.cent_id
       |  GROUP BY 1, 2)
       |SELECT query_id, CAST(rank AS INT) AS rank, vec_id,
       |  CAST(approx_us AS DOUBLE) / 1000000.0 AS approx_dist
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx_us, vec_id) AS rank FROM adc)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // ------------------------------------------------------------ registry

  // ---------------------------------------------------------------- q119
  /** End-to-end REAL image pipeline: deterministic PPM images seeded
    * per doc_id ([[SyntheticImages]]), decoded to pixels by
    * [[ImageCodec]], DCT-hashed by [[Multimodal.perceptualHash]] —
    * each doc's original vs its re-exposed (brightness +12) variant,
    * reduced to one golden aggregate row. A brightness shift moves
    * only the DC coefficient (plus clamp noise), so hamming distances
    * sit near zero — the invariance pHash exists to provide, proven
    * over real decoded pixels. The oracle embeds the golden values:
    * the transform is not SQL-expressible, but it is bit-deterministic
    * (integer decode/resample, StrictMath DCT basis), so the literal
    * row is a genuine regression gate; the row counts are recomputed
    * independently by DuckDB. Pinned to doc_ids 0..499 (present at
    * every sf) so the goldens are scale-factor-independent. */
  def imagePhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def hashes(brightness: Int, out: String) = Multimodal.perceptualHash(s,
      docs(s, dir).select(col("doc_id")).filter(col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map(id =>
          (id, "image/ppm", SyntheticImages.generate(id, brightness))))
        .toDF("doc_id", "media_type", "payload"))
      .withColumnRenamed("phash", out)
    hashes(0, "ph_o").join(hashes(12, "ph_v"), "doc_id")
      .withColumn("ham", bit_count(col("ph_o").bitwiseXOR(col("ph_v"))))
      .agg(
        count(lit(1)).as("n"),
        expr("bit_xor(ph_o)").as("xor_phash"),
        sum(col("ham")).as("sum_hamming"),
        max(col("ham")).cast("long").as("max_hamming"),
        sum(when(col("ham") <= lit(10), 1L).otherwise(0L)).as("n_close"))
  }

  // golden values computed once from the deterministic generator +
  // decoder + DCT over doc_ids 0..499 — a window present at EVERY
  // scale factor, so the goldens hold whichever sfDir the harness
  // passes (n_close == n: every re-exposed pair sits within hamming
  // 10, the invariance the tier promises)
  val imagePhashSql: String =
    """SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id < 500) AS n,
      |  CAST(7151956904586395566 AS BIGINT) AS xor_phash,
      |  CAST(101 AS BIGINT) AS sum_hamming,
      |  CAST(5 AS BIGINT) AS max_hamming,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id < 500) AS n_close""".stripMargin

  // ---------------------------------------------------------------- q194
  /** Real-format codec round-trip over the in-JDK `imageio` decoders:
    * each doc's deterministic raster ([[SyntheticImages.generateRgb]])
    * re-encoded as PNG (lossless) and JPEG q=0.9 (lossy), decoded back
    * through the [[ImageCodec]] JPEG/PNG path, and pHashed against the
    * PPM original. PNG must round-trip to the IDENTICAL hash (lossless
    * pixels → identical luma → identical DCT); JPEG must stay inside
    * the near-dup hamming radius — the compression-invariance pHash
    * exists to provide, now demonstrated over a real entropy-coded
    * format rather than the raw formats alone. Counts (not raw JPEG
    * hash goldens) are the gate: JPEG sample values are deterministic
    * for a given JDK but not pinned across JDK majors. */
  def imageCodecRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val W = SyntheticImages.Width
    val H = SyntheticImages.Height
    def hashes(mt: String, encode: Array[Int] => Array[Byte], out: String) =
      Multimodal.perceptualHash(s,
        docs(s, dir).select(col("doc_id")).filter(col("doc_id") < 500)
          .as[Long]
          .mapPartitions(_.map(id =>
            (id, mt, encode(SyntheticImages.generateRgb(id)))))
          .toDF("doc_id", "media_type", "payload"))
        .withColumnRenamed("phash", out)
    hashes("image/ppm", ImageCodec.encodePpm(W, H, _), "ph_o")
      .join(hashes("image/png", ImageCodec.encodePng(W, H, _), "ph_png"), "doc_id")
      .join(hashes("image/jpeg", ImageCodec.encodeJpeg(W, H, _), "ph_jpg"), "doc_id")
      .withColumn("ham_j", bit_count(col("ph_o").bitwiseXOR(col("ph_jpg"))))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("ph_png") === col("ph_o"), 1L).otherwise(0L))
          .as("n_png_exact"),
        sum(when(col("ham_j") <= lit(10), 1L).otherwise(0L))
          .as("n_jpeg_close"))
  }

  // every PNG round-trip is hash-identical and every JPEG round-trip
  // lands within hamming 10 — invariants of the transform, so the
  // oracle recomputes only the count and equates the rest to it
  val imageCodecRoundtripSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(*) AS BIGINT) AS n_png_exact,
      |  CAST(COUNT(*) AS BIGINT) AS n_jpeg_close
      |FROM documents WHERE doc_id < 500""".stripMargin

  // ---------------------------------------------------------------- q200
  /** End-to-end REAL audio pipeline ([[AudioCodec]], the acoustic
    * sibling of q119/q194): deterministic WAV clips seeded per doc_id
    * ([[SyntheticAudio]]), decoded through the RIFF/PCM-16 parser,
    * reduced to integer acoustic features (loudness integral, peak,
    * zero crossings, 64-frame energy-delta sign fingerprint) — each
    * clip against its gain-halved re-level, whose fingerprint must sit
    * within a small hamming radius (uniform gain preserves frame-
    * energy ORDER up to integer-truncation ties — the invariance the
    * descriptor exists to provide). Golden literals are legitimate:
    * the whole pipeline is integer + StrictMath arithmetic, specified
    * bit-exactly across JVMs, unlike the q194 JPEG samples. */
  def audioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def feats(gain: Int, p: String) =
      docs(s, dir).select(col("doc_id")).filter(col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map { id =>
          val a = AudioCodec.decode(SyntheticAudio.generate(id, gain)).get
          val f = AudioCodec.features(a)
          (id, f.nSamples, f.sumAbs, f.peak, f.zeroCrossings,
            f.energyFingerprint)
        })
        .toDF("doc_id", p + "n", p + "sum_abs", p + "peak", p + "zc", p + "fp")
    feats(100, "o_").join(feats(50, "v_"), "doc_id")
      .withColumn("ham", bit_count(col("o_fp").bitwiseXOR(col("v_fp"))))
      .agg(
        count(lit(1)).as("n"),
        expr("bit_xor(o_fp)").as("xor_fp"),
        sum(col("o_zc")).as("sum_zc"),
        max(col("o_peak")).cast("long").as("max_peak"),
        sum(when(col("ham") <= lit(4), 1L).otherwise(0L)).as("n_fp_close"))
  }

  // golden values computed once from the deterministic generator +
  // decoder over doc_ids 0..499 (present at every sf); n_fp_close == n
  // pins the gain-invariance of the energy fingerprint
  val audioFeaturesSql: String =
    """SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id < 500) AS n,
      |  CAST(2252336163610265883 AS BIGINT) AS xor_fp,
      |  CAST(479131 AS BIGINT) AS sum_zc,
      |  CAST(17406 AS BIGINT) AS max_peak,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id < 500) AS n_fp_close""".stripMargin

  // ---------------------------------------------------------------- q201
  /** End-to-end REAL video pipeline ([[VideoCodec]], closing the
    * image/audio/video triple): deterministic Y4M clips seeded per
    * doc_id ([[SyntheticVideos]], 12 frames with a brightness walk +
    * scrolling bar), frame-SAMPLED every 3rd frame (the pixel work a
    * 100 TB corpus pays scales with sampled frames; skipped frames
    * are an O(1) offset walk), each sampled luma plane pHashed — and
    * every clip compared frame-by-frame against its re-exposed
    * (brightness +12) variant, which must stay within the near-dup
    * hamming radius. Golden literals are legitimate: decode, resample,
    * and the StrictMath DCT are bit-specified. */
  def videoFrameHashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def hashes(brightness: Int, p: String) =
      docs(s, dir).select(col("doc_id")).filter(col("doc_id") < 300)
        .as[Long]
        .flatMap { id =>
          val (meta, hs) = VideoCodec.frameHashes(
            SyntheticVideos.generate(id, brightness), sampleEvery = 3).get
          hs.map { case (fi, hv) => (id, fi, meta.nFrames.toLong, hv) }
        }
        .toDF("doc_id", "frame", p + "total", p + "h")
    hashes(0, "o_").join(hashes(12, "v_"), Seq("doc_id", "frame"))
      .withColumn("ham", bit_count(col("o_h").bitwiseXOR(col("v_h"))))
      .agg(
        count(lit(1)).as("n_frames_sampled"),
        countDistinct(col("doc_id")).as("n_clips"),
        sum(col("o_total")).as("sum_total_frames"),
        expr("bit_xor(o_h)").as("xor_hash"),
        sum(when(col("ham") <= lit(10), 1L).otherwise(0L)).as("n_close"))
  }

  // goldens over doc_ids 0..299 (a window present at every sf):
  // 4 sampled frames per 12-frame clip; n_close == n_frames_sampled
  // pins the re-exposure invariance frame by frame
  val videoFrameHashesSql: String =
    """SELECT (SELECT CAST(4 * COUNT(*) AS BIGINT) FROM documents WHERE doc_id < 300) AS n_frames_sampled,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id < 300) AS n_clips,
      |  (SELECT CAST(48 * COUNT(*) AS BIGINT) FROM documents WHERE doc_id < 300) AS sum_total_frames,
      |  CAST(-3306504184127469056 AS BIGINT) AS xor_hash,
      |  (SELECT CAST(4 * COUNT(*) AS BIGINT) FROM documents WHERE doc_id < 300) AS n_close""".stripMargin

  // ---------------------------------------------------------------- q123
  /** Contrastive negative sampling ([[NegativeSampling]]): k=4
    * deterministic different-label negatives per anchor from a 10%
    * hash pool. The pool is the only replicated side (broadcast); the
    * per-anchor top-k runs as the bounded-heap topk_by aggregate —
    * one shuffle of 4-row partials, no window sort. The oracle
    * recomputes the identical sample from the shared integer mix. */
  def negativePairs(s: SparkSession, dir: String): DataFrame =
    NegativeSampling.negatives(emb(s, dir), "vec_id", "label",
      k = 4, poolPerMille = 100)
      .orderBy("anchor_id", "rank")

  val negativePairsSql: String =
    """WITH pool AS (
      |  SELECT vec_id AS neg_id, label AS neg_label FROM embeddings
      |  WHERE (vec_id * 2654435761) % 1000 < 100),
      |ranked AS (
      |  SELECT e.vec_id AS anchor_id, p.neg_id,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |      ((e.vec_id % 100003) * 73856093 +
      |       (p.neg_id % 100003) * 19349663) % 2147483647,
      |      p.neg_id) AS rank
      |  FROM embeddings e JOIN pool p ON p.neg_label <> e.label)
      |SELECT anchor_id, CAST(rank AS BIGINT) AS rank, neg_id
      |FROM ranked WHERE rank <= 4 ORDER BY anchor_id, rank""".stripMargin

  // ---------------------------------------------------------------- q124
  /** Inverted index with capped postings ([[CorpusOps.invertedIndex]]):
    * term → true document frequency + first 12 doc_ids ascending,
    * joined to a comma string. One corpus explode, one aggregate —
    * df as a single-column distinct count (no Expand), postings via
    * the bounded topk_by heap (stopword-proof: k longs of state per
    * term regardless of corpus size). */
  def invertedIndexTerms(s: SparkSession, dir: String): DataFrame =
    CorpusOps.invertedIndex(docs(s, dir), k = 12).orderBy("term")

  val invertedIndexTermsSql: String =
    """WITH td AS (SELECT DISTINCT doc_id, term FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  WHERE len(term) >= 3),
      |ranked AS (SELECT term, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM td),
      |agg AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM td GROUP BY 1),
      |post AS (SELECT term,
      |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      |  FROM ranked WHERE rn <= 12 GROUP BY 1)
      |SELECT term, df, postings FROM agg JOIN post USING (term)
      |ORDER BY term""".stripMargin

  // ---------------------------------------------------------------- q125
  /** One BPE merge round ([[CorpusOps.bpePairCounts]]): the top-30
    * adjacent character pairs inside words, corpus-wide — iterating
    * this operator IS byte-pair-encoding vocab training; the plan is
    * explode → partial-aggregable count → TakeOrderedAndProject
    * (per-partition top-N, no global sort). */
  def bpePairs(s: SparkSession, dir: String): DataFrame =
    CorpusOps.bpePairCounts(docs(s, dir), topN = 30)

  val bpePairsSql: String =
    """WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |pairs AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
      |    i -> substr(w, i, 2))) AS pair
      |  FROM words WHERE len(w) >= 2)
      |SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM pairs GROUP BY 1
      |ORDER BY cnt DESC, pair LIMIT 30""".stripMargin

  // ---------------------------------------------------------------- q126
  /** Hard-negative mining ([[NegativeSampling.hardNegatives]]): the
    * k=6 highest-cosine different-label pool candidates per anchor —
    * [[negativePairs]]' skeleton with the micro-unit integer cosine
    * as the ranking key (broadcast pool, bounded topk_by heap, one
    * shuffle, no window sort). The oracle recomputes the full
    * anchors × pool ranking in SQL over the SAME floor-based
    * micro-units (raw cosine, no engine round() in the path). */
  def hardNegativePairs(s: SparkSession, dir: String): DataFrame =
    NegativeSampling.hardNegatives(emb(s, dir), "vec_id", "label",
      "embedding", k = 6, poolPerMille = 100)
      .orderBy("anchor_id", "rank")

  val hardNegativePairsSql: String =
    s"""WITH pool AS (
      |  SELECT vec_id AS neg_id, label AS neg_label, embedding AS ne
      |  FROM embeddings WHERE (vec_id * 2654435761) % 1000 < 100),
      |scored AS (
      |  SELECT e.vec_id AS anchor_id, p.neg_id,
      |    CAST(floor(${rawCosSql("e.embedding", "p.ne")} * 1000000.0 + 0.5) AS BIGINT) AS micro
      |  FROM embeddings e JOIN pool p ON p.neg_label <> e.label),
      |ranked AS (SELECT anchor_id, neg_id, micro,
      |    ROW_NUMBER() OVER (PARTITION BY anchor_id
      |      ORDER BY micro DESC, neg_id) AS rank FROM scored)
      |SELECT anchor_id, CAST(rank AS BIGINT) AS rank, neg_id,
      |  micro / 1000000.0 AS cos_sim
      |FROM ranked WHERE rank <= 6 ORDER BY anchor_id, rank""".stripMargin

  // ---------------------------------------------------------------- q128
  /** Bigram-LM held-out scoring ([[NgramLm.scoreHeldOut]]): Laplace
    * model trained on the doc_id%10≠0 slice, every %10=0 doc scored
    * by mean scaled probability + unseen-bigram count — CCNet-style
    * corpus-typicality, kept transcendental-free (exact BIGINT
    * parts-per-1e9, see [[NgramLm]]'s determinism contract). */
  def lmScore(s: SparkSession, dir: String): DataFrame =
    NgramLm.scoreHeldOut(docs(s, dir), materialize = _.localCheckpoint())

  val lmScoreSql: String = NgramLm.scoreHeldOutSql()

  // ---------------------------------------------------------------- q129
  /** PMI collocations ([[NgramLm.pmiCollocations]]): min-support-5
    * bigrams ranked by the PMI ratio N·c(a,b)/(c(a,·)·c(·,b)) — log
    * is monotone so the order IS the PMI order, with no `ln` in
    * either engine's path. */
  def pmiTop(s: SparkSession, dir: String): DataFrame =
    NgramLm.pmiCollocations(docs(s, dir), materialize = _.localCheckpoint())

  val pmiTopSql: String = NgramLm.pmiCollocationsSql()

  // ---------------------------------------------------------------- q130
  /** Embedding covariance cells ([[Pca.gramCells]]): the full 64-dim
    * upper triangle from ONE constant-buffer typed-Aggregator pass —
    * exact micro-unit BIGINT moments, centered covariance as a pinned
    * double expression. The corpus-scale half of PCA; the d×d eigen
    * end-game is [[Pca.principalComponents]] (unit-verified — a
    * DuckDB oracle can't express Jacobi iteration). */
  def embeddingGram(s: SparkSession, dir: String): DataFrame =
    Pca.gramCells(emb(s, dir), "embedding", dim = 64)

  val embeddingGramSql: String = Pca.gramCellsSql(dim = 64)

  // ---------------------------------------------------------------- q133
  /** Per-dimension z-score standardization ([[Pca.standardize]]):
    * exact-moment means/sds from one Gram pass, then a narrow
    * `zip_with` rewrite — surfaced exploded to (vec_id, dim, z) so
    * the oracle checks EVERY standardized element bit-exactly. */
  def standardizedEmbeddings(s: SparkSession, dir: String): DataFrame =
    Pca.standardize(emb(s, dir), "vec_id", "embedding", dim = 64)
      .select(col("vec_id"), posexplode(col("z")).as(Seq("pos", "z")))
      .select(col("vec_id"), (col("pos") + 1).cast("int").as("dim"), col("z"))
      .orderBy(col("vec_id"), col("dim"))

  val standardizedEmbeddingsSql: String =
    """WITH m AS (SELECT vec_id, list_transform(embedding,
      |    e -> CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS mv
      |  FROM embeddings),
      |stats AS (SELECT ii.g AS i, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(mv[ii.g]) AS BIGINT) AS s,
      |    CAST(SUM(mv[ii.g] * mv[ii.g]) AS BIGINT) AS g2
      |  FROM m, generate_series(1, 64) ii(g) GROUP BY ii.g),
      |st2 AS (SELECT i,
      |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS mu,
      |    sqrt((CAST(g2 AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
      |      / 1000000000000.0) AS sd
      |  FROM stats),
      |packed AS (SELECT list(mu ORDER BY i) AS mus, list(sd ORDER BY i) AS sds
      |  FROM st2)
      |SELECT vec_id, CAST(u.g AS INTEGER) AS dim,
      |  (CAST(mv[u.g] AS DOUBLE) / 1000000.0 - mus[u.g]) / sds[u.g] AS z
      |FROM m, packed, generate_series(1, 64) u(g)
      |ORDER BY vec_id, dim""".stripMargin

  // ---------------------------------------------------------------- q135
  /** Asymmetric containment pairs ([[Dedup.containmentPairs]]): the
    * quote/excerpt detector Jaccard can't see — df-capped shared-
    * shingle candidates, exact both-direction containment verify. */
  def containmentPairsQ(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(docs(s, dir), n = 3, threshold = 0.6, maxDf = 500,
      materialize = _.localCheckpoint())

  val containmentPairsSql: String =
    """WITH sh AS (SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(string_split(text, ' ')) < 3 THEN [text]
      |    ELSE list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
      |           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))
      |    END)) AS g FROM documents),
      |keep AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) <= 500),
      |shk AS (SELECT doc_id, sh.g FROM sh JOIN keep USING (g)),
      |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM shk x JOIN shk y USING (g) WHERE x.doc_id < y.doc_id),
      |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh
      |  FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.a, c.b, CAST(COUNT(*) AS BIGINT) AS n_shared
      |  FROM cand c
      |  JOIN sh x ON x.doc_id = c.a
      |  JOIN sh y ON y.doc_id = c.b AND y.g = x.g
      |  GROUP BY c.a, c.b)
      |SELECT a, b, n_shared,
      |  CAST(n_shared AS DOUBLE) / CAST(sa.nsh AS DOUBLE) AS containment_ab,
      |  CAST(n_shared AS DOUBLE) / CAST(sb.nsh AS DOUBLE) AS containment_ba
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = a
      |JOIN sizes sb ON sb.doc_id = b
      |WHERE GREATEST(CAST(n_shared AS DOUBLE) / CAST(sa.nsh AS DOUBLE),
      |               CAST(n_shared AS DOUBLE) / CAST(sb.nsh AS DOUBLE)) >= 0.6
      |ORDER BY a, b""".stripMargin

  // ---------------------------------------------------------------- q154
  /** BM25-style lexical retrieval, log-free: top-15 documents for a
    * fixed 3-term query over the corpus — the retrieval/attribution
    * primitive one tier above q124's inverted index (WHICH training
    * docs answer this probe, ranked, not just which contain it).
    *
    * The scoring is Robertson–Spärck Jones BM25 with ONE substitution:
    * the idf's `ln((N−df+0.5)/(df+0.5))` becomes the RATIONAL
    * `(N−df+0.5)/(df+0.5)` itself, carried as exact integer ppm
    * `(10⁶·(2(N−df)+1)) div (2df+1)` — the log is monotone, so
    * per-term orderings are THE SAME, and the rational form needs no
    * transcendental whose last ulp could split engines (q128's
    * discipline). Term-frequency saturation keeps real BM25's
    * k1 = 1.2, b = 0.75 shape in micro-units:
    * `sat_µ = (tf·22·10¹¹) div (tf·10⁶ + (12·10⁵·norm_µ) div 10⁶)`
    * with `norm_µ = 25·10⁴ + (75·10⁴·len·N) div L` (len/avglen as the
    * exact `len·N/L`). Every value is a pure integer function of the
    * corpus; all operands non-negative so truncating div == floor //.
    *
    * Shape: ONE corpus tokenize-explode; doc lengths and per-term tfs
    * partial-aggregate map-side out of the same explode; N/L and the
    * 3-row df table are the only broadcasts; final ranking is
    * doc-grain. */
  def bm25Retrieval(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("dup", "vector", "merge")
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    val corpus = lens.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("l_total"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    tf.join(broadcast(dfT), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"), col("term"),
        expr("(1000000 * (2*(n_docs - df) + 1)) div (2*df + 1)").as("idf_ppm"),
        expr("""(tf * 2200000 * 1000000) div
          | (tf * 1000000 + (1200000 * (250000 + (750000 * len * n_docs) div l_total)) div 1000000)"""
          .stripMargin).as("sat_ppm"))
      .groupBy(col("doc_id"))
      .agg(sum(expr("(idf_ppm * sat_ppm) div 1000000")).as("score_ppm"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(15)
  }

  val bm25RetrievalSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |lens AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len
      |  FROM toks GROUP BY 1),
      |corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len) AS BIGINT) AS l_total FROM lens),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
      |  WHERE term IN ('dup', 'vector', 'merge') GROUP BY 1, 2),
      |dft AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM tf GROUP BY 1),
      |scored AS (SELECT tf.doc_id,
      |    (1000000 * (2*(n_docs - df) + 1)) // (2*df + 1) AS idf_ppm,
      |    (tf * 2200000 * 1000000) //
      |      (tf * 1000000 + (1200000 * (250000 + (750000 * len * n_docs) // l_total)) // 1000000)
      |      AS sat_ppm
      |  FROM tf JOIN dft USING (term) JOIN lens ON lens.doc_id = tf.doc_id,
      |    corpus)
      |SELECT doc_id,
      |  CAST(SUM((idf_ppm * sat_ppm) // 1000000) AS BIGINT) AS score_ppm,
      |  CAST(COUNT(*) AS BIGINT) AS n_terms
      |FROM scored GROUP BY 1
      |ORDER BY score_ppm DESC, doc_id LIMIT 15""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q154_bm25_retrieval" -> (bm25Retrieval _),
    "q135_containment_pairs" -> (containmentPairsQ _),
    "q123_negative_pairs" -> (negativePairs _),
    "q124_inverted_index" -> (invertedIndexTerms _),
    "q125_bpe_pairs" -> (bpePairs _),
    "q126_hard_negatives" -> (hardNegativePairs _),
    "q128_lm_score" -> (lmScore _),
    "q129_pmi_collocations" -> (pmiTop _),
    "q130_embedding_gram" -> (embeddingGram _),
    "q133_standardized_embeddings" -> (standardizedEmbeddings _),
    "q40_exact_dedup" -> (exactDedup _),
    "q41_normalized_dedup" -> (normalizedDedup _),
    "q42_minhash_lsh_pairs" -> (minhashLshPairs _),
    "q43_jaccard_pairs" -> (jaccardPairs _),
    "q176_prefix_jaccard" -> (prefixJaccard _),
    "q44_simhash" -> (simhashFingerprints _),
    "q45_cosine_topk" -> (cosineTopK _),
    "q177_binary_hamming_topk" -> (binaryHammingTopK _),
    "q46_ann_bucket_topk" -> (annBucketTopK _),
    "q47_lang_id" -> (langId _),
    "q48_quality_metrics" -> (qualityMetrics _),
    "q49_token_counts" -> (tokenCounts _),
    "q50_fingerprints" -> (fingerprints _),
    "q51_multimodal_features" -> (multimodalFeatures _),
    "q52_embedding_neardup" -> (embeddingNearDup _),
    "q53_ivf_topk" -> (ivfTopK _),
    "q54_dedup_corpus" -> (dedupCorpus _),
    "q55_simhash_neardup" -> (simhashNearDup _),
    "q56_heuristic_filter" -> (heuristicFilter _),
    "q57_ivf_topk_indexed" -> (ivfTopKIndexed _),
    "q239_ivf_stale_rebuild" -> (ivfStaleRebuild _),
    "q58_quantize_embeddings" -> (quantizeEmbeddings _),
    "q59_repetition_metrics" -> (repetitionMetrics _),
    "q60_redact_pii" -> (redactPii _),
    "q61_dedup_clusters" -> (dedupClusters _),
    "q62_decontaminate" -> (decontaminate _),
    "q104_bloom_decontaminate" -> (bloomDecontaminate _),
    "q63_hash_split" -> (hashSplit _),
    "q64_top_terms" -> (topTerms _),
    "q186_category_codebook" -> (categoryCodebook _),
    "q187_feature_hash" -> (featureHashBuckets _),
    "q65_pack_sequences" -> (packSequences _),
    "q66_kmeans_clusters" -> (kmeansClusters _),
    "q180_cluster_top_terms" -> (clusterTopTerms _),
    "q67_dup_ngrams" -> (dupNgrams _),
    "q68_quality_score" -> (qualityScore _),
    "q69_token_budget_sample" -> (tokenBudgetSample _),
    "q70_snapshot_delta" -> (snapshotDelta _),
    "q71_minhash_jaccard_est" -> (minhashJaccardEst _),
    "q72_word_rarity" -> (wordRarity _),
    "q77_trim_shared_spans" -> (trimSharedSpans _),
    "q105_longest_shared_spans" -> (longestSharedSpans _),
    "q78_source_health" -> (sourceHealth _),
    "q82_stratified_sample" -> (stratifiedSample _),
    "q90_ann_recall" -> (annRecall _),
    "q91_heavy_hitters" -> (heavyHitters _),
    "q92_mixture_weights" -> (mixtureWeights _),
    "q93_pq_topk" -> (pqTopK _),
    "q110_label_centroids" -> (labelCentroids _),
    "q112_prototype_confusion" -> (prototypeConfusion _),
    "q119_image_phash" -> (imagePhash _),
    "q120_ivfpq_topk" -> (ivfPqTopK _),
    "q194_image_codec_roundtrip" -> (imageCodecRoundtrip _),
    "q200_audio_features" -> (audioFeatures _),
    "q201_video_frame_hashes" -> (videoFrameHashes _),
  )

  val oracles: Map[String, String] = Map(
    "q154_bm25_retrieval" -> bm25RetrievalSql,
    "q135_containment_pairs" -> containmentPairsSql,
    "q123_negative_pairs" -> negativePairsSql,
    "q124_inverted_index" -> invertedIndexTermsSql,
    "q125_bpe_pairs" -> bpePairsSql,
    "q126_hard_negatives" -> hardNegativePairsSql,
    "q128_lm_score" -> lmScoreSql,
    "q129_pmi_collocations" -> pmiTopSql,
    "q130_embedding_gram" -> embeddingGramSql,
    "q133_standardized_embeddings" -> standardizedEmbeddingsSql,
    "q40_exact_dedup" -> exactDedupSql,
    "q41_normalized_dedup" -> normalizedDedupSql,
    "q42_minhash_lsh_pairs" -> minhashLshPairsSql,
    "q43_jaccard_pairs" -> jaccardPairsSql,
    "q176_prefix_jaccard" -> prefixJaccardSql,
    "q44_simhash" -> simhashFingerprintsSql,
    "q45_cosine_topk" -> cosineTopKSql,
    "q177_binary_hamming_topk" -> binaryHammingTopKSql,
    "q46_ann_bucket_topk" -> annBucketTopKSql,
    "q47_lang_id" -> langIdSql,
    "q48_quality_metrics" -> qualityMetricsSql,
    "q49_token_counts" -> tokenCountsSql,
    "q50_fingerprints" -> fingerprintsSql,
    "q51_multimodal_features" -> multimodalFeaturesSql,
    "q52_embedding_neardup" -> embeddingNearDupSql,
    "q53_ivf_topk" -> ivfTopKSql,
    "q54_dedup_corpus" -> dedupCorpusSql,
    "q55_simhash_neardup" -> simhashNearDupSql,
    "q56_heuristic_filter" -> heuristicFilterSql,
    "q57_ivf_topk_indexed" -> ivfTopKSql,
    "q239_ivf_stale_rebuild" -> ivfTopKSql,
    "q58_quantize_embeddings" -> quantizeEmbeddingsSql,
    "q59_repetition_metrics" -> repetitionMetricsSql,
    "q60_redact_pii" -> redactPiiSql,
    "q61_dedup_clusters" -> dedupClustersSql,
    "q62_decontaminate" -> decontaminateSql,
    "q104_bloom_decontaminate" -> bloomDecontaminateSql,
    "q63_hash_split" -> hashSplitSql,
    "q64_top_terms" -> topTermsSql,
    "q186_category_codebook" -> categoryCodebookSql,
    "q187_feature_hash" -> featureHashBucketsSql,
    "q65_pack_sequences" -> packSequencesSql,
    "q66_kmeans_clusters" -> kmeansClustersSql,
    "q180_cluster_top_terms" -> clusterTopTermsSql,
    "q67_dup_ngrams" -> dupNgramsSql,
    "q68_quality_score" -> qualityScoreSql,
    "q69_token_budget_sample" -> tokenBudgetSampleSql,
    "q70_snapshot_delta" -> snapshotDeltaSql,
    "q71_minhash_jaccard_est" -> minhashJaccardEstSql,
    "q72_word_rarity" -> wordRaritySql,
    "q77_trim_shared_spans" -> trimSharedSpansSql,
    "q105_longest_shared_spans" -> longestSharedSpansSql,
    "q78_source_health" -> sourceHealthSql,
    "q82_stratified_sample" -> stratifiedSampleSql,
    "q90_ann_recall" -> annRecallSql,
    "q91_heavy_hitters" -> heavyHittersSql,
    "q92_mixture_weights" -> mixtureWeightsSql,
    "q93_pq_topk" -> pqTopKSql,
    "q110_label_centroids" -> labelCentroidsSql,
    "q112_prototype_confusion" -> prototypeConfusionSql,
    "q119_image_phash" -> imagePhashSql,
    "q194_image_codec_roundtrip" -> imageCodecRoundtripSql,
    "q200_audio_features" -> audioFeaturesSql,
    "q201_video_frame_hashes" -> videoFrameHashesSql,
    "q120_ivfpq_topk" -> ivfPqTopKSql,
  )
}
