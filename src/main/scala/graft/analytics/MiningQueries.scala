package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.Exact._

/** Data-mining tier over the warehouse star schema: sketchy quantiles,
  * graph propagation, entity resolution, market-basket association and
  * trend smoothing — the workloads a warehouse team reaches for once
  * the plain aggregates (q01–q19) are routine.
  *
  * House numerics discipline throughout: exact integer/decimal
  * arithmetic wherever a value crosses an engine boundary, floor
  * division only over non-negative operands (Spark `div` truncates
  * toward zero, DuckDB `//` floors — they agree only when signs can't
  * differ), and any IEEE double produced by ONE pinned expression
  * order so both engines round identically.
  */
object MiningQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  // ---------------------------------------------------------------- q138
  /** Mergeable histogram quantiles (HdrHistogram shape): order-value
    * p50/p95/p99 per priority from a log₂-binned histogram with 4
    * mantissa bits — bucket `xp·16 + ⌊cents/2^(xp−4)⌋ mod 16` where
    * `xp = ⌊log₂ cents⌋`, giving ≤ 6.25 % relative error by
    * construction (measured ≤ 4 % on this data vs the exact discrete
    * quantile). The estimate surfaces each selected bucket's UPPER
    * edge, so it is a guaranteed overestimate within one sub-bucket.
    *
    * Why not exact percentiles: an exact distributed quantile needs a
    * full sort (or Spark's `percentile` whose per-group state is the
    * value multiset). The histogram's state is ≤ ~64·16 counters per
    * group REGARDLESS of row count, partial-aggregates map-side, and
    * merges by addition — the only quantile shape that survives a
    * 100 TB fact table with millions of groups. The log₂ exponent
    * comes from the binary-digit COUNT (`length(conv(cents,10,2))`,
    * DuckDB `length(printf('%b',…))`) — pure integer, no `log()`
    * transcendental to disagree in the last ulp.
    *
    * Shape: one partial-aggregable shuffle to (pri, bucket) — ~320
    * rows total — then a window walk over the tiny histogram. The
    * rank `⌈p·n/100⌉` is the all-integer `(p·n+99) div 100`. */
  def histogramQuantiles(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "orders").select(
      col("o_orderpriority").as("pri"),
      (dec(col("o_totalprice"), 12, 2) * 100).cast("long").as("cents"))
    val b = c
      .withColumn("xp", (length(conv(col("cents"), 10, 2)) - 1).cast("long"))
      .withColumn("pow2",
        expr("shiftleft(cast(1 as bigint), cast(greatest(xp - 4, 0) as int))"))
      .select(col("pri"),
        expr("case when cents < 16 then cents" +
          " else xp*16 + (cents div pow2) % 16 end").as("bucket"),
        expr("case when cents < 16 then cents" +
          " else ((cents div pow2) % 16 + 17) * pow2 - 1 end").as("hi"))
      .groupBy(col("pri"), col("bucket"), col("hi"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("pri")).orderBy(col("bucket"))
    val wAll = Window.partitionBy(col("pri"))
    b.withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy(col("pri"), col("n"))
      .agg(
        min(when(col("cum") >= expr("(50*n+99) div 100"), col("hi"))).as("p50_hi_cents"),
        min(when(col("cum") >= expr("(95*n+99) div 100"), col("hi"))).as("p95_hi_cents"),
        min(when(col("cum") >= expr("(99*n+99) div 100"), col("hi"))).as("p99_hi_cents"))
      .select(col("pri"), col("n"), col("p50_hi_cents"),
        col("p95_hi_cents"), col("p99_hi_cents"))
      .orderBy(col("pri"))
  }

  val histogramQuantilesSql: String =
    """WITH c AS (SELECT o_orderpriority AS pri,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2))*100 AS BIGINT) AS cents
      |  FROM orders),
      |e AS (SELECT pri, cents, LENGTH(PRINTF('%b', cents)) - 1 AS xp,
      |    CAST(1 AS BIGINT) << GREATEST(LENGTH(PRINTF('%b', cents)) - 5, 0) AS pow2
      |  FROM c),
      |b AS (SELECT pri,
      |    CASE WHEN cents < 16 THEN cents
      |         ELSE xp*16 + (cents // pow2) % 16 END AS bucket,
      |    CASE WHEN cents < 16 THEN cents
      |         ELSE ((cents // pow2) % 16 + 17) * pow2 - 1 END AS hi,
      |    COUNT(*) AS cnt
      |  FROM e GROUP BY 1, 2, 3),
      |cum AS (SELECT pri, bucket, hi, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY pri ORDER BY bucket) AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY pri) AS BIGINT) AS n FROM b)
      |SELECT pri, n,
      |  MIN(CASE WHEN cum >= (50*n+99)//100 THEN hi END) AS p50_hi_cents,
      |  MIN(CASE WHEN cum >= (95*n+99)//100 THEN hi END) AS p95_hi_cents,
      |  MIN(CASE WHEN cum >= (99*n+99)//100 THEN hi END) AS p99_hi_cents
      |FROM cum GROUP BY pri, n ORDER BY pri""".stripMargin

  // ---------------------------------------------------------------- q139
  /** Supplier influence by damped rank propagation over the bipartite
    * customer–supplier trade graph (PageRank's bipartite cousin):
    * every customer starts at 1.0, mass flows customer→supplier→
    * customer→supplier along distinct trade edges, each hop splitting
    * a node's score over its degree and damping by 0.85 — so a
    * supplier scores high for serving many customers whose OWN
    * suppliers are few: exclusive relationships weigh more than
    * promiscuous ones, which is what raw degree can't see.
    *
    * Exact integer micro-units end to end: damping 0.85 is the
    * integer `17·x div 20`, each split is `score div degree` — all
    * operands non-negative so truncation == floor in both engines and
    * the fixed 3-hop unroll is a pure function of the edge set (no
    * float accumulation order to disagree).
    *
    * Shape (round 17): the edge list is the only corpus-scale table,
    * and every hop is an aggregate of a PER-EDGE value over one side —
    * so degrees and hop sums compute as WINDOW aggregates over the
    * edge set itself, alternating partition keys (c, s, c, s). That
    * turns the former shape — two degree-table builds + three
    * join-per-hop legs over a localCheckpoint-pinned edge table (5
    * sort-merge joins, 10 exchanges, one materialize) — into ONE
    * linear pass: 4 exchanges, 0 joins, 0 checkpoint, identical exact
    * integer arithmetic (same per-edge operands, same truncating
    * `div`s, long addition is order-free). The final per-supplier fold
    * is a plain partial-aggregable groupBy; the supplier dim
    * broadcasts onto the ranking as before. At 100 TB each window
    * partition holds one node's edges (spills gracefully; the
    * join+groupBy shape shuffled the same per-node row groups), and
    * the 6 edge-table shuffles this removes are the network cost that
    * dominates at scale (guide §2.4: remove shuffles outright). */
  def bipartiteRank(s: SparkSession, dir: String,
                    materialize: DataFrame => DataFrame = identity): DataFrame = {
    // single-consumer linear chain — no materialize needed (kept in the
    // signature for call-site compatibility; identity by default)
    val e = materialize(
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct())
    val wc = Window.partitionBy(col("c"))
    val ws = Window.partitionBy(col("s"))
    e.withColumn("dc", count(lit(1)).over(wc))
      .withColumn("ds", count(lit(1)).over(ws))
      .withColumn("rs1sum", sum(expr("1000000 div dc")).over(ws))
      .withColumn("rs1", expr("150000 + (17 * rs1sum) div 20"))
      .withColumn("rc1sum", sum(expr("rs1 div ds")).over(wc))
      .withColumn("rc1", expr("150000 + (17 * rc1sum) div 20"))
      .groupBy(col("s"))
      .agg(expr("150000 + (17 * sum(rc1 div dc)) div 20").as("r"))
      .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))),
        col("s") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("r").as("influence_micro"))
      .orderBy(col("influence_micro").desc, col("s_suppkey"))
      .limit(25)
  }

  val bipartiteRankSql: String =
    """WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      |    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |degc AS (SELECT c, COUNT(*) AS dc FROM e GROUP BY 1),
      |degs AS (SELECT s, COUNT(*) AS ds FROM e GROUP BY 1),
      |rs1 AS (SELECT e.s,
      |    150000 + (17 * CAST(SUM(1000000 // dc) AS BIGINT)) // 20 AS r
      |  FROM e JOIN degc USING (c) GROUP BY e.s),
      |rc1 AS (SELECT e.c,
      |    150000 + (17 * CAST(SUM(rs1.r // ds) AS BIGINT)) // 20 AS r
      |  FROM e JOIN rs1 ON e.s = rs1.s JOIN degs ON e.s = degs.s GROUP BY e.c),
      |rs2 AS (SELECT e.s,
      |    150000 + (17 * CAST(SUM(rc1.r // dc) AS BIGINT)) // 20 AS r
      |  FROM e JOIN rc1 ON e.c = rc1.c JOIN degc ON e.c = degc.c GROUP BY e.s)
      |SELECT s_suppkey, s_name, CAST(r AS BIGINT) AS influence_micro
      |FROM rs2 JOIN supplier ON s = s_suppkey
      |ORDER BY influence_micro DESC, s_suppkey LIMIT 25""".stripMargin

  // ---------------------------------------------------------------- q141
  /** Entity resolution over customer names: all pairs within
    * levenshtein distance 1, found by DELETION-NEIGHBORHOOD blocking
    * (the symmetric-delete / SymSpell scheme): each name emits itself
    * plus every single-character deletion as block keys, and any two
    * strings within edit distance 1 share at least one key
    * (substitution at position i → both i-deletions agree; pure
    * insert/delete → the shorter name IS a deletion of the longer) —
    * GUARANTEED recall, verified against the brute-force quadratic
    * join in the spec. The verify stage computes the true
    * `levenshtein` over the full names (identical unit-cost semantics
    * in Spark and DuckDB).
    *
    * Why not fixed-substring blocks: any scheme keyed on a digit
    * subset collapses on dense zero-padded IDs (every key shares the
    * high digits → one block holds the corpus and the join goes
    * quadratic — measured 49 s at sf0.1). Deletion keys carry ALL the
    * string's information except one character, so a block holds only
    * genuine near-matches: fan-out is a fixed (len+1)× explode,
    * LINEAR in the corpus, and block width tracks true duplicate
    * density. Same discipline as the simhash banding tier: blocking
    * keys are equi-join buckets, never a similarity predicate that
    * would plan as a nested-loop all-pairs scan.
    *
    * Shape: one generated-column explode (codegen HOF, no UDF), one
    * equi self-join on the variant key, pair-key distinct (a pair can
    * share up to len+1 keys), bounded verify. `materialize` pins the
    * variant table so the explode runs once, not once per join side.
    * The distinct runs over the two KEY columns alone — names and
    * nation flags re-attach afterwards via broadcast joins against
    * the dimension — so the dedup shuffle carries 16 bytes per row
    * instead of two name strings (the round-6 shape shuffled the wide
    * rows: measured 7.7 s → 3 s class at sf0.1). */
  def recordLinkage(s: SparkSession, dir: String,
                    materialize: DataFrame => DataFrame = identity): DataFrame = {
    val cust = t(s, dir, "customer")
    val v = materialize(
      cust
        .select(col("c_custkey"),
          // array_distinct: deleting any of a run of equal characters
          // (the zero-padding) yields the SAME variant string — one
          // key per record, not one per deletion position, or the
          // self-join multiplies every real pair by run-length²
          explode(expr(
            """array_distinct(transform(sequence(0, length(c_name)),
              |  i -> if(i = 0, c_name,
              |          concat(substring(c_name, 1, i-1),
              |                 substring(c_name, i+1, length(c_name))))))""".stripMargin))
            .as("v")))
    val a = v.alias("a")
    val b = v.alias("b")
    val cand = a.join(b,
        col("a.v") === col("b.v") && col("a.c_custkey") < col("b.c_custkey"))
      .select(
        col("a.c_custkey").as("key_a"), col("b.c_custkey").as("key_b"))
      .distinct()
    cand
      .join(broadcast(cust.select(col("c_custkey").as("key_a"),
        col("c_name").as("name_a"), col("c_nationkey").as("nat_a"))), Seq("key_a"))
      .join(broadcast(cust.select(col("c_custkey").as("key_b"),
        col("c_name").as("name_b"), col("c_nationkey").as("nat_b"))), Seq("key_b"))
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev") <= 1)
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"),
        (col("nat_a") === col("nat_b")).as("same_nation"), col("lev"))
      .orderBy(col("key_a"), col("key_b"))
  }

  val recordLinkageSql: String =
    """WITH c AS (SELECT c_custkey, c_name, c_nationkey,
      |    SUBSTRING(c_name, 10, 3) AS k1, SUBSTRING(c_name, 13, 3) AS k2,
      |    SUBSTRING(c_name, 16, 3) AS k3 FROM customer),
      |cand AS (
      |  SELECT DISTINCT a.c_custkey AS key_a, b.c_custkey AS key_b,
      |    a.c_name AS name_a, b.c_name AS name_b,
      |    a.c_nationkey = b.c_nationkey AS same_nation
      |  FROM c a JOIN c b
      |    ON a.c_custkey < b.c_custkey
      |   AND ((a.k1 = b.k1 AND a.k2 = b.k2) OR (a.k1 = b.k1 AND a.k3 = b.k3)
      |     OR (a.k2 = b.k2 AND a.k3 = b.k3)))
      |SELECT key_a, key_b, name_a, name_b, same_nation,
      |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev
      |FROM cand WHERE levenshtein(name_a, name_b) <= 1
      |ORDER BY key_a, key_b""".stripMargin

  // ---------------------------------------------------------------- q142
  /** Market-basket co-purchase lift: part pairs ordered together more
    * often than independence predicts —
    * `lift = N·c(a,b) / (c(a)·c(b))` over distinct (order, part)
    * incidences, support ≥ 3, top 100. The classic association-rule
    * screen (which parts should be bundled / co-located).
    *
    * Numerics: counts are exact BIGINTs; the surfaced lift is the ONE
    * pinned IEEE expression `(double(N)·c_ab) / (double(c_a)·c_b)` —
    * int→double conversions exact below 2⁵³, then one multiply each
    * side of one divide, so both engines produce the identical double
    * (the integer-cross-product alternative `N·c_ab·10⁶` would
    * overflow BIGINT at warehouse scale; the division is the safe
    * form).
    *
    * Shape: the basket explode is a SELF-JOIN ON l_orderkey — fan-out
    * is Σ per-order `m·(m−1)/2` with m ≤ ~7 lines per order, so it
    * scales linearly with the fact table, never quadratically with
    * the part catalog. One shuffle to distinct (o, p), the self-join
    * reuses that partitioning, pair counts partial-aggregate
    * map-side; the per-part support table joins by part key. The
    * 1-row N scalar is the only broadcast. */
  def copurchaseLift(s: SparkSession, dir: String): DataFrame = {
    // Round 17: the basket folds to ONE per-order sorted part set
    // (collect_set dedups map-side exactly as the former distinct
    // did), and pairs generate in-row from the sorted array (j > i ⇒
    // part_a < part_b — the former self-join predicate). This removes
    // the former (o, p) distinct exchange AND the self-join's re-
    // shuffle by o (guide §2.4); order count and per-part supports
    // read the same folded table, so its one exchange is shared by
    // all three consumers via exchange reuse (the pair lambda sits
    // ABOVE the exchange, where it cannot defeat reuse). Per-order
    // fan-out is unchanged: m ≤ ~7 lines per order at any scale.
    val ops = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o")).agg(sort_array(collect_set(col("p"))).as("ps"))
    val n = ops.agg(count(lit(1)).as("n_orders"))
    val supp = ops.select(explode(col("ps")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("c"))
    val pairs = ops
      .filter(size(col("ps")) >= 2)
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)), y ->
          |    struct(x AS part_a, y AS part_b))))""".stripMargin)).as("pr"))
      .select(col("pr.part_a").as("part_a"), col("pr.part_b").as("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 3)
    pairs
      .join(supp.withColumnRenamed("p", "pa").withColumnRenamed("c", "ca"),
        col("part_a") === col("pa"))
      .join(supp.withColumnRenamed("p", "pb").withColumnRenamed("c", "cb"),
        col("part_b") === col("pb"))
      .crossJoin(broadcast(n))
      .select(col("part_a"), col("part_b"), col("c_ab"),
        ((col("n_orders").cast("double") * col("c_ab")) /
          (col("ca").cast("double") * col("cb"))).as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(100)
  }

  val copurchaseLiftSql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM op),
      |supp AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM op GROUP BY 1),
      |pairs AS (SELECT a.p AS part_a, b.p AS part_b, CAST(COUNT(*) AS BIGINT) AS c_ab
      |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2)
      |SELECT part_a, part_b, c_ab,
      |  (CAST(n_orders AS DOUBLE) * c_ab) / (CAST(sa.c AS DOUBLE) * sb.c) AS lift
      |FROM pairs, n
      |JOIN supp sa ON part_a = sa.p JOIN supp sb ON part_b = sb.p
      |WHERE c_ab >= 3
      |ORDER BY lift DESC, part_a, part_b LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q143
  /** Per-nation EWMA trend of daily revenue, α = 1/8 in exact integer
    * cents: `s₀ = x₀`, `sₜ = (7·sₜ₋₁ + xₜ) div 8` — every operand
    * non-negative, so the truncating `div` IS floor and the whole
    * series is a pure integer function of the daily totals (a float
    * EWMA would compound rounding differently per engine; a log-space
    * α^k window form needs `pow`). The anomaly/trend primitive for
    * revenue monitoring.
    *
    * Shape: the recursion is inherently sequential, so it runs at the
    * RIGHT grain — the corpus-scale work is the one partial-aggregable
    * shuffle to (nation, day); the per-nation day series (calendar-
    * sized, ~10³ rows) then folds in a typed per-group pass with ONE
    * Long of state — no driver loop, no per-step shuffle (the DuckDB
    * oracle needs a recursive CTE for the same walk). At 100 TB the
    * day grain per nation is unchanged — the fold's input is bounded
    * by the calendar, never by the fact table. */
  def revenueEwma(s: SparkSession, dir: String): DataFrame = {
    val dayRev = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderdate").as("d"))
      .agg(sum((dec(col("o_totalprice"), 12, 2) * 100).cast("long")).as("cents"))
    // Per-nation linear fold over the calendar-sized series. This is
    // the one place the typed API beats Catalyst: `aggregate` +
    // `array_append` re-copies the accumulated array per element —
    // O(days²) struct memcpy (measured ~4 s of pure copying at sf0.1)
    // — while a typed fold walks the sorted series once with a single
    // Long of state. Per-group memory is calendar-bounded (~10³ rows)
    // no matter the fact-table size, the same bound the HOF had.
    import s.implicits._
    dayRev
      .select(col("n_name"), col("d").cast("timestamp_ntz").as("d"),
        col("cents"))
      .as[(String, java.time.LocalDateTime, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (n: String, it: Iterator[(String, java.time.LocalDateTime, Long)]) =>
        val sorted = it.toArray.sortWith((a, b) => a._2.isBefore(b._2))
        var sAcc = 0L
        var first = true
        sorted.iterator.map { case (_, d, cents) =>
          sAcc = if (first) cents else (7 * sAcc + cents) / 8
          first = false
          (n, d, cents, sAcc)
        }
      }
      .toDF("n_name", "d", "cents", "ewma_cents")
      .orderBy(col("n_name"), col("d"))
  }

  val revenueEwmaSql: String =
    """WITH RECURSIVE day_rev AS (SELECT n_name, o_orderdate AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2))*100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2),
      |idx AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY d) AS i
      |  FROM day_rev),
      |ew AS (
      |  SELECT n_name, d, i, cents, cents AS ewma FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT idx.n_name, idx.d, idx.i, idx.cents, (7*ew.ewma + idx.cents) // 8
      |  FROM ew JOIN idx ON idx.n_name = ew.n_name AND idx.i = ew.i + 1)
      |SELECT n_name, d, cents, CAST(ewma AS BIGINT) AS ewma_cents
      |FROM ew ORDER BY n_name, d""".stripMargin

  // ---------------------------------------------------------------- q145
  /** Per-nation CUSUM change detection over daily revenue — the
    * classic upward-level-shift monitor: `s₀ = 0`,
    * `sₜ = max(0, sₜ₋₁ + xₜ − μ − k)` with reference μ = the nation's
    * own mean daily revenue (exact integer `total div n`) and slack
    * `k = μ div 10`; a day alarms when `sₜ > μ` (threshold h = μ).
    * Surfaced per nation: peak statistic, alarm-day count, first alarm
    * date. Everything is integer cents — subtraction then `greatest`,
    * no division on a possibly-negative operand (the one place Spark's
    * truncating `div` and DuckDB's flooring `//` could split).
    *
    * Same scale skeleton as q143: the corpus collapses in ONE shuffle
    * to (nation, day); the calendar-sized series folds in one Catalyst
    * `aggregate` HOF (DuckDB needs a recursive CTE); the per-nation
    * mean table broadcasts onto the fold input. */
  def revenueCusum(s: SparkSession, dir: String): DataFrame = {
    val dayRev = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderdate").as("d"))
      .agg(sum((dec(col("o_totalprice"), 12, 2) * 100).cast("long")).as("cents"))
    val mu = dayRev.groupBy(col("n_name"))
      .agg(expr("sum(cents) div count(1)").as("mu"))
    dayRev.join(broadcast(mu), Seq("n_name"))
      .groupBy(col("n_name"), col("mu"))
      .agg(sort_array(collect_list(struct(col("d"), col("cents")))).as("xs"))
      .select(col("n_name"), expr(
        """aggregate(xs,
          |  named_struct('s', cast(0 as bigint), 'mx', cast(0 as bigint),
          |    'al', cast(0 as bigint), 'fa', cast(null as timestamp_ntz)),
          |  (acc, x) -> named_struct(
          |    's', greatest(cast(0 as bigint), acc.s + x.cents - mu - mu div 10),
          |    'mx', greatest(acc.mx,
          |      greatest(cast(0 as bigint), acc.s + x.cents - mu - mu div 10)),
          |    'al', acc.al + if(greatest(cast(0 as bigint),
          |      acc.s + x.cents - mu - mu div 10) > mu, 1, 0),
          |    'fa', if(acc.fa is null and greatest(cast(0 as bigint),
          |      acc.s + x.cents - mu - mu div 10) > mu, x.d, acc.fa)),
          |  acc -> acc)""".stripMargin).as("r"))
      .select(col("n_name"), col("r.mx").as("max_cusum"),
        col("r.al").as("n_alarm_days"), col("r.fa").as("first_alarm_day"))
      .orderBy(col("n_name"))
  }

  val revenueCusumSql: String =
    """WITH RECURSIVE day_rev AS (SELECT n_name, o_orderdate AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2))*100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2),
      |m AS (SELECT n_name, CAST(SUM(cents) AS BIGINT) // COUNT(*) AS mu
      |  FROM day_rev GROUP BY 1),
      |idx AS (SELECT day_rev.*, mu,
      |    ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY d) AS i
      |  FROM day_rev JOIN m USING (n_name)),
      |cu AS (
      |  SELECT n_name, d, i, mu,
      |    GREATEST(CAST(0 AS BIGINT), cents - mu - mu // 10) AS s
      |  FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT idx.n_name, idx.d, idx.i, idx.mu,
      |    GREATEST(CAST(0 AS BIGINT), cu.s + idx.cents - idx.mu - idx.mu // 10)
      |  FROM cu JOIN idx ON idx.n_name = cu.n_name AND idx.i = cu.i + 1)
      |SELECT n_name, CAST(MAX(s) AS BIGINT) AS max_cusum,
      |  CAST(SUM(CASE WHEN s > mu THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_days,
      |  MIN(CASE WHEN s > mu THEN d END) AS first_alarm_day
      |FROM cu GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q146
  /** Benford first-digit audit of order values — the fraud/synthetic-
    * data screen: observed first-significant-digit distribution vs
    * Benford's law, deviations in parts-per-million. The Benford
    * probabilities `log₁₀(1+1/d)` are FIXED constants embedded as the
    * same integer-ppm literals in both engines (301030 … 45757, sum
    * exactly 1 000 000) — no runtime `log` anywhere; observed shares
    * are exact integer `obs·10⁶ div n` (envelope: overflows past
    * ~9·10¹² rows — shard and merge counts first at that size). The
    * first digit comes from the decimal string of integer cents,
    * identical in both engines for positive integers.
    *
    * (On TPC-H-uniform prices the audit rightly screams — uniform
    * data is exactly what Benford flags as unnatural.)
    *
    * Shape: one partial-aggregable shuffle to 9 digit groups; the
    * 1-row total is the only broadcast. */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    val benford =
      """CASE digit WHEN '1' THEN 301030 WHEN '2' THEN 176091
        | WHEN '3' THEN 124939 WHEN '4' THEN 96910 WHEN '5' THEN 79181
        | WHEN '6' THEN 66947 WHEN '7' THEN 57992 WHEN '8' THEN 51153
        | WHEN '9' THEN 45757 END""".stripMargin
    val d = t(s, dir, "orders")
      .select((dec(col("o_totalprice"), 12, 2) * 100).cast("long").as("cents"))
      .groupBy(substring(col("cents").cast("string"), 1, 1).as("digit"))
      .agg(count(lit(1)).as("observed"))
    val n = d.agg(sum(col("observed")).as("n"))
    d.crossJoin(broadcast(n))
      .select(col("digit"), col("observed"),
        expr("(observed * 1000000) div n").as("observed_ppm"),
        expr(benford).cast("long").as("benford_ppm"),
        (expr("(observed * 1000000) div n") - expr(benford).cast("long"))
          .as("deviation_ppm"))
      .orderBy(col("digit"))
  }

  val benfordAuditSql: String =
    """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2))*100 AS BIGINT)
      |    AS cents FROM orders),
      |d AS (SELECT SUBSTRING(CAST(cents AS VARCHAR), 1, 1) AS digit,
      |    CAST(COUNT(*) AS BIGINT) AS observed FROM c GROUP BY 1),
      |n AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM d),
      |b AS (SELECT digit, observed,
      |    (observed * 1000000) // n AS observed_ppm,
      |    CASE digit WHEN '1' THEN 301030 WHEN '2' THEN 176091
      |      WHEN '3' THEN 124939 WHEN '4' THEN 96910 WHEN '5' THEN 79181
      |      WHEN '6' THEN 66947 WHEN '7' THEN 57992 WHEN '8' THEN 51153
      |      WHEN '9' THEN 45757 END AS benford_ppm
      |  FROM d, n)
      |SELECT digit, observed, CAST(observed_ppm AS BIGINT) AS observed_ppm,
      |  CAST(benford_ppm AS BIGINT) AS benford_ppm,
      |  CAST(observed_ppm - benford_ppm AS BIGINT) AS deviation_ppm
      |FROM b ORDER BY digit""".stripMargin

  // ---------------------------------------------------------------- q148
  /** Per-nation autocorrelation (lags 1–7) of the daily-revenue
    * series — the seasonality probe behind every forecasting model:
    * a strong lag-7 spike means weekly rhythm, a slow lag-1 decay
    * means momentum, ≈0 everywhere means the series is noise (TPC-H's
    * uniform order stream — and the probe rightly says so).
    *
    * Numerics: Pearson r over the lagged pairs from SIX exact
    * moments — n, Σx, Σy, Σxy, Σx², Σy² — accumulated as
    * DECIMAL(38,0) of integer-cent products (cents ≤ ~6·10⁷ so each
    * product < 2⁵³·precision envelope; Σ over a calendar of days
    * never nears 38 digits). Each moment converts to double ONCE
    * (nearest-even, identical in both engines) and
    * `r = (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − Σx²ᵗᵉʳᵐ) · sqrt(n·Σy² −
    * Σy²ᵗᵉʳᵐ))` is the SAME pinned IEEE expression tree on both
    * sides — multiplies, subtracts and two exactly-rounded `sqrt`s,
    * no transcendental (q147's discipline).
    *
    * Scale: corpus work is the ONE shuffle to (nation, day) — after
    * that the series is calendar-sized. The seven lags ride ONE
    * window over that small series (sorted once per nation), unpivot
    * to (lag, x, y) pairs, and the moments partial-aggregate
    * map-side. Lag is measured in ACTIVE-day steps (gaps close up) —
    * deterministic because (nation, day) is unique. */
  def revenueAutocorr(s: SparkSession, dir: String): DataFrame = {
    val dayRev = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderdate").as("d"))
      .agg(sum((dec(col("o_totalprice"), 12, 2) * 100).cast("long")).as("cents"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("d"))
    val lagged = dayRev.select(
      col("n_name") +: col("cents").as("x") +:
        (1 to 7).map(k => lag(col("cents"), k).over(w).as(s"y$k")): _*)
    val pairs = lagged.select(col("n_name"), col("x"), expr(
      "stack(7, 1L, y1, 2L, y2, 3L, y3, 4L, y4, 5L, y5, 6L, y6, 7L, y7)")
        .as(Seq("lag", "y")))
      .filter(col("y").isNotNull)
    pairs.groupBy(col("n_name"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
      .select(col("n_name"), col("lag"), col("n"),
        expr("""(cast(n as double) * cast(sxy as double)
          | - cast(sx as double) * cast(sy as double))
          | / (sqrt(cast(n as double) * cast(sxx as double)
          |      - cast(sx as double) * cast(sx as double))
          |    * sqrt(cast(n as double) * cast(syy as double)
          |      - cast(sy as double) * cast(sy as double)))""".stripMargin)
          .as("r"))
      .orderBy(col("n_name"), col("lag"))
  }

  val revenueAutocorrSql: String =
    """WITH day_rev AS (SELECT n_name, o_orderdate AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2))*100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2),
      |lagged AS (SELECT n_name, cents AS x,
      |    LAG(cents, 1) OVER w AS y1, LAG(cents, 2) OVER w AS y2,
      |    LAG(cents, 3) OVER w AS y3, LAG(cents, 4) OVER w AS y4,
      |    LAG(cents, 5) OVER w AS y5, LAG(cents, 6) OVER w AS y6,
      |    LAG(cents, 7) OVER w AS y7
      |  FROM day_rev WINDOW w AS (PARTITION BY n_name ORDER BY d)),
      |pairs AS (
      |  SELECT n_name, 1 AS lag, x, y1 AS y FROM lagged WHERE y1 IS NOT NULL
      |  UNION ALL SELECT n_name, 2, x, y2 FROM lagged WHERE y2 IS NOT NULL
      |  UNION ALL SELECT n_name, 3, x, y3 FROM lagged WHERE y3 IS NOT NULL
      |  UNION ALL SELECT n_name, 4, x, y4 FROM lagged WHERE y4 IS NOT NULL
      |  UNION ALL SELECT n_name, 5, x, y5 FROM lagged WHERE y5 IS NOT NULL
      |  UNION ALL SELECT n_name, 6, x, y6 FROM lagged WHERE y6 IS NOT NULL
      |  UNION ALL SELECT n_name, 7, x, y7 FROM lagged WHERE y7 IS NOT NULL),
      |m AS (SELECT n_name, lag, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
      |    CAST(SUM(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
      |    CAST(SUM(CAST(x AS HUGEINT)*y) AS DECIMAL(38,0)) AS sxy,
      |    CAST(SUM(CAST(x AS HUGEINT)*x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(SUM(CAST(y AS HUGEINT)*y) AS DECIMAL(38,0)) AS syy
      |  FROM pairs GROUP BY 1, 2)
      |SELECT n_name, CAST(lag AS BIGINT) AS lag, n,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
      |FROM m ORDER BY n_name, lag""".stripMargin

  // ---------------------------------------------------------------- q150
  /** Supplier-community triangles: count, per supplier, the triangles
    * of the co-fulfillment graph (edge = two suppliers co-appearing
    * in ≥ 4 orders). Triangle participation is the classic
    * clustering/community signal — a supplier embedded in a dense
    * clique of co-suppliers vs one with the same degree spread over
    * disconnected partners; pure degree can't tell them apart.
    *
    * Shape is the distributed triangle-enumeration standard: edges
    * are ORIENTED low-key → high-key, so each triangle {a<b<c}
    * materializes exactly once as the wedge (a,b)+(b,c) closed by
    * (a,c) — no division by 6, no symmetric blowup. The wedge join
    * is the quadratic hazard; the support-≥ 4 threshold is the degree
    * cap (at production scale the orientation flips to
    * lower-DEGREE → higher-degree, which provably caps wedge fan-out
    * at O(edges^1.5) — same plan shape, different sort key). The
    * co-order counting itself is linear: orders fan out to
    * (lines-per-order choose 2) ≈ 21 pairs each.
    *
    * Exact integer counts end to end; top 20 by (triangles, suppkey)
    * both deterministic. */
  def supplierTriangles(s: SparkSession, dir: String,
                        materialize: DataFrame => DataFrame = identity): DataFrame = {
    // materialize hook (q139's former discipline): the edge table feeds
    // THREE join legs — without pinning, each leg replays the edge
    // build (measured 42 s -> ~3 s at sf0.1). The edge set is
    // node²-bounded (tiny next to the fact table), so the closing leg
    // broadcasts.
    //
    // Edge build (round 17): co-supplier pairs generate PER ORDER from
    // a collect_set fold — one partial-aggregable shuffle keyed by
    // order, then an in-row pair expansion (sorted set, j > i, so each
    // unordered pair appears once with a < b — exactly the former
    // `x.sk < y.sk` self-join predicate). The former shape paid a
    // distinct shuffle on (ok, sk) PLUS a re-shuffle of both self-join
    // sides by ok and the join sort; the fold reaches the same pair
    // stream with one exchange and no join (guide §2.4). Fan-out is
    // unchanged — Σ (lines-per-order choose 2), m ≤ ~7 — and the
    // per-order set is bounded by lines per order at any scale.
    val e = materialize(
      t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .groupBy(col("ok"))
        .agg(sort_array(collect_set(col("sk"))).as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(explode(expr(
          """flatten(transform(ss, (x, i) ->
            |  transform(slice(ss, i + 2, size(ss)), y ->
            |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 4)
        .select(col("a"), col("b")))
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.b") === col("bc.a"))
      .join(broadcast(e.as("ac")), col("ac.a") === col("ab.a") &&
        col("ac.b") === col("bc.b"))
      .select(col("ab.a").as("a"), col("ab.b").as("b"), col("bc.b").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("s_suppkey"))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("triangles"))
      .orderBy(col("triangles").desc, col("s_suppkey"))
      .limit(20)
  }

  val supplierTrianglesSql: String =
    """WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
      |  FROM lineitem),
      |e AS (SELECT x.sk AS a, y.sk AS b
      |  FROM os x JOIN os y ON x.ok = y.ok AND x.sk < y.sk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 4),
      |tri AS (SELECT ab.a, ab.b, bc.b AS c
      |  FROM e ab JOIN e bc ON ab.b = bc.a
      |  JOIN e ac ON ac.a = ab.a AND ac.b = bc.b),
      |part AS (SELECT a AS s_suppkey FROM tri
      |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
      |SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS triangles
      |FROM part GROUP BY 1
      |ORDER BY triangles DESC, s_suppkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q167
  /** Mixture-drift monitor: how far the per-nation composition of
    * order volume shifted between the early period (pre-1996) and the
    * late period — each nation's share of each period's orders in
    * exact integer ppm (`1e6·c div total`), plus the per-nation L1
    * contribution `|ppm_a − ppm_b|`. Summing the contributions gives
    * 2× the total-variation distance between the two mixtures — the
    * distribution-shift alarm for a training-data pipeline, WITHOUT
    * the `ln` a PSI/KL monitor would need (the house
    * no-transcendental rule: TV distance is all integer arithmetic).
    *
    * Shape: one partial-aggregable groupBy(nation) with conditional
    * sums (no second scan for the period split), period totals ride a
    * 1-row broadcast. */
  def mixtureDrift(s: SparkSession, dir: String): DataFrame = {
    val split = to_date(col("o_orderdate")) < lit("1996-01-01").cast("date")
    val byNation = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(when(split, 1L).otherwise(0L)).as("c_a"),
        sum(when(split, 0L).otherwise(1L)).as("c_b"))
    val totals = byNation.agg(sum(col("c_a")).as("t_a"), sum(col("c_b")).as("t_b"))
    byNation.crossJoin(broadcast(totals))
      .select(col("n_name"), col("c_a"), col("c_b"),
        expr("(1000000 * c_a) div t_a").as("ppm_a"),
        expr("(1000000 * c_b) div t_b").as("ppm_b"),
        abs(expr("(1000000 * c_a) div t_a") - expr("(1000000 * c_b) div t_b"))
          .as("l1_ppm"))
      .orderBy(col("n_name"))
  }

  val mixtureDriftSql: String =
    """WITH bn AS (SELECT n_name,
      |    CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01' THEN 1
      |             ELSE 0 END) AS BIGINT) AS c_a,
      |    CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01' THEN 0
      |             ELSE 1 END) AS BIGINT) AS c_b
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c_a) AS BIGINT) AS t_a,
      |               CAST(SUM(c_b) AS BIGINT) AS t_b FROM bn)
      |SELECT n_name, c_a, c_b,
      |  (1000000 * c_a) // t_a AS ppm_a,
      |  (1000000 * c_b) // t_b AS ppm_b,
      |  abs((1000000 * c_a) // t_a - (1000000 * c_b) // t_b) AS l1_ppm
      |FROM bn CROSS JOIN tot ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q169
  /** Shuffle-skew audit over the warehouse's hot join keys: for each
    * (table, key) pair, the exact group-size distribution summary a
    * planner (or an engineer sizing a salted join) needs — key count,
    * row count, max group, exact p50/p99 group size, and the heaviest
    * key's share of all rows in integer ppm. A `top_share_ppm` in the
    * tens of thousands says the key needs salting or an AQE skew
    * split BEFORE the job ships; this measures it from the data
    * instead of discovering it from a straggler task.
    *
    * Numerics: the percentiles use q138's all-integer rank walk
    * (`rank = (p·n+99) div 100`, pick the min size whose cumulative
    * key count reaches it) over the SIZE HISTOGRAM — group sizes
    * collapse to (size, n_keys) first, so the walk's input is
    * distinct-sizes-sized regardless of key cardinality.
    *
    * Shape: per pair, one partial-aggregable groupBy(key) — the only
    * corpus-scale shuffle — then a groupBy(size) onto the tiny
    * histogram and one window walk over it. */
  def joinKeySkew(s: SparkSession, dir: String): DataFrame = {
    def profile(df: DataFrame, key: String, label: String): DataFrame = {
      val sizes = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      val hist = sizes.groupBy(col("c")).agg(count(lit(1)).as("nk"))
      val wCum = Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      hist
        .withColumn("cum", sum(col("nk")).over(wCum))
        .withColumn("n_keys", sum(col("nk")).over(wAll))
        .withColumn("n_rows", sum(col("c") * col("nk")).over(wAll))
        .groupBy(col("n_keys"), col("n_rows"))
        .agg(max(col("c")).as("max_group"),
          min(when(col("cum") >= expr("(50*n_keys+99) div 100"), col("c")))
            .as("p50_group"),
          min(when(col("cum") >= expr("(99*n_keys+99) div 100"), col("c")))
            .as("p99_group"))
        .select(lit(label).as("table_key"), col("n_keys"), col("n_rows"),
          col("max_group"), col("p50_group"), col("p99_group"),
          expr("(1000000 * max_group) div n_rows").as("top_share_ppm"))
    }
    profile(t(s, dir, "lineitem"), "l_orderkey", "lineitem.l_orderkey")
      .unionByName(profile(t(s, dir, "lineitem"), "l_partkey", "lineitem.l_partkey"))
      .unionByName(profile(t(s, dir, "orders"), "o_custkey", "orders.o_custkey"))
      .orderBy(col("table_key"))
  }

  val joinKeySkewSql: String = {
    def profile(table: String, key: String): String =
      s"""SELECT '$table.$key' AS table_key, n_keys, n_rows,
         |  MAX(c) AS max_group,
         |  MIN(CASE WHEN cum >= (50*n_keys+99) // 100 THEN c END) AS p50_group,
         |  MIN(CASE WHEN cum >= (99*n_keys+99) // 100 THEN c END) AS p99_group,
         |  (1000000 * MAX(c)) // n_rows AS top_share_ppm
         |FROM (SELECT c, CAST(SUM(nk) OVER (ORDER BY c) AS BIGINT) AS cum,
         |    CAST(SUM(nk) OVER () AS BIGINT) AS n_keys,
         |    CAST(SUM(c * nk) OVER () AS BIGINT) AS n_rows
         |  FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS nk
         |    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM $table GROUP BY $key)
         |    GROUP BY c))
         |GROUP BY n_keys, n_rows""".stripMargin
    s"""${profile("lineitem", "l_orderkey")}
       |UNION ALL
       |${profile("lineitem", "l_partkey")}
       |UNION ALL
       |${profile("orders", "o_custkey")}
       |ORDER BY table_key""".stripMargin
  }

  // ---------------------------------------------------------------- q189
  /** Forward-fill over the generated day spine: q183's calendar
    * densification plus the CARRY — each gap day surfaces the last
    * observed whale-day revenue and its staleness in days ("latest
    * known value as of d", the feature-serving join shape). The fill
    * is `last(col, ignoreNulls)` over an unpartitioned day-grain
    * window — bounded by the calendar axis at ANY corpus scale (q11
    * rule), so the one-partition sort never sees fact rows. Revenue
    * travels as exact cents; staleness is an exact date diff. */
  def forwardFillRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val daily = o.filter(col("o_totalprice") > 350000)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((sum(dec(col("o_totalprice"), 12, 2)) * 100).cast("long")
        .as("rev_cents"))
    val bounds = o.agg(to_date(min(col("o_orderdate"))).as("lo"),
      to_date(max(col("o_orderdate"))).as("hi"))
    val spine = bounds.select(explode(expr(
      "sequence(lo, hi, interval 1 day)")).as("d"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("d"), "left")
      .withColumn("filled", last(col("rev_cents"), ignoreNulls = true).over(w))
      .withColumn("last_active",
        last(when(col("rev_cents").isNotNull, col("d")),
          ignoreNulls = true).over(w))
      .select(col("d"),
        coalesce(col("filled"), lit(0L)).as("filled_cents"),
        coalesce(datediff(col("d"), col("last_active")), lit(-1))
          .cast("long").as("staleness_days"),
        when(col("rev_cents").isNotNull, 1L).otherwise(0L).as("active"))
      .orderBy("d")
  }

  val forwardFillRevenueSql: String =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
      |      AS rev_cents
      |  FROM orders WHERE o_totalprice > 350000 GROUP BY 1),
      |b AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
      |             CAST(MAX(o_orderdate) AS DATE) AS hi FROM orders),
      |spine AS (SELECT CAST(unnest(generate_series(lo, hi,
      |    INTERVAL 1 DAY)) AS DATE) AS d FROM b),
      |j AS (SELECT spine.d, daily.rev_cents
      |      FROM spine LEFT JOIN daily ON spine.d = daily.d)
      |SELECT d,
      |  CAST(COALESCE(last_value(rev_cents IGNORE NULLS) OVER w, 0)
      |    AS BIGINT) AS filled_cents,
      |  CAST(COALESCE(date_diff('day',
      |    last_value(CASE WHEN rev_cents IS NOT NULL THEN d END
      |      IGNORE NULLS) OVER w, d), -1) AS BIGINT) AS staleness_days,
      |  CAST(CASE WHEN rev_cents IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS active
      |FROM j
      |WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY d""".stripMargin

  // ---------------------------------------------------------------- q190
  /** Rendezvous (highest-random-weight) routing: every document is
    * assigned to the worker maximizing a 48-bit md5 score of
    * `doc_id:worker` — computed as a PURE NARROW MAP (an array_max
    * over a generated per-worker struct array; no shuffle touches the
    * doc-grain stream, the property routing must have at 100 TB).
    * Scaling 5 → 6 workers, the scores of existing workers are
    * untouched, so an assignment changes ONLY when the new worker
    * wins: the output proves minimal disruption mechanically
    * (`n_moved_in` = 0 for workers 0–4, = `n_docs` for worker 5,
    * ~1/6 of the corpus). Consistent-hash routing with an exact,
    * cross-engine score. */
  def rendezvousRouting(s: SparkSession, dir: String): DataFrame = {
    def pick(n: Int) = expr(
      s"""cast(array_max(transform(sequence(0, ${n - 1}),
         |  w -> named_struct(
         |    'hv', cast(conv(substring(md5(concat(cast(doc_id as string),
         |            ':', cast(w as string))), 1, 12), 16, 10) as bigint),
         |    'w', w))).w as bigint)""".stripMargin)
    t(s, dir, "documents").select(col("doc_id"),
        pick(5).as("w5"), pick(6).as("w6"))
      .groupBy(col("w6").as("worker"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("w5") =!= col("w6"), 1L).otherwise(0L)).cast("long")
          .as("n_moved_in"))
      .orderBy("worker")
  }

  val rendezvousRoutingSql: String = {
    def assign(n: Int, alias: String): String =
      s"""$alias AS (SELECT doc_id, w FROM (
         |  SELECT doc_id, w, ROW_NUMBER() OVER (PARTITION BY doc_id
         |    ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
         |      CAST(w AS VARCHAR)), 1, 12) AS BIGINT) DESC, w DESC) AS rn
         |  FROM documents,
         |    (SELECT unnest(generate_series(0, ${n - 1})) AS w)) WHERE rn = 1)"""
        .stripMargin
    s"""WITH ${assign(5, "a5")},
       |${assign(6, "a6")}
       |SELECT CAST(a6.w AS BIGINT) AS worker,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN a5.w <> a6.w THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_moved_in
       |FROM a5 JOIN a6 USING (doc_id)
       |GROUP BY 1 ORDER BY worker""".stripMargin
  }

  // ---------------------------------------------------------------- q191
  /** Rolling 7-day distinct users from MERGED per-day KMV sketches —
    * the sketch answer to q166's exact rolling WAU. The exact rolling
    * path re-deduplicates user×7 rows per window; the sketch path
    * keeps ≤ k=64 hashes PER DAY (the q83/q116 KMV convention: 48-bit
    * md5 prefix, estimate (k−1)·2⁴⁸/h₍ₖ₎), unions 7 day-sketches and
    * re-takes the k-th minimum — mergeability is the whole point: at
    * 100 TB the daily sketches are metadata-scale and any window
    * (7-day, 30-day, quarter) merges from them without touching the
    * fact stream again. Both paths surface side by side with the
    * relative error in exact ppm — the honesty contract pattern. */
  def rollingKmvWau(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    val ud = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = ud.select(col("day")).distinct()
    // each (source-day, value) row feeds the 7 windows ending on
    // day..day+6 — the equi-join window expansion (no range join)
    val windowed = (df: DataFrame) => df
      .withColumnRenamed("day", "src")
      .select(explode(expr(
        "sequence(src, date_add(src, 6), interval 1 day)")).as("day"),
        col("*"))
      .drop("src")
      .join(days, Seq("day"), "left_semi")
    val daySketch = ud
      .withColumn("hv", conv(substring(md5(col("user_id").cast("string")),
        1, 12), 16, 10).cast("long"))
      .select(col("day"), col("hv")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("day").orderBy("hv")))
      .filter(col("rn") <= k).select("day", "hv")
    val merged = windowed(daySketch).select("day", "hv").distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("day").orderBy("hv")))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy("day")))
      .filter(col("rn") === least(col("nd"), lit(k)))
      .select(col("day"),
        when(col("nd") < k, col("nd").cast("double"))
          .otherwise(lit(63.0) * lit(281474976710656L) /
            col("hv").cast("double")).as("kmv_wau"))
    val exact = windowed(ud)
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("exact_wau"))
    exact.join(merged, Seq("day"))
      .withColumn("abs_err_ppm",
        floor(abs(col("kmv_wau") - col("exact_wau")) * 1000000
          / col("exact_wau")).cast("long"))
      .orderBy("day")
  }

  val rollingKmvWauSql: String =
    """WITH ud AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    user_id FROM events),
      |days AS (SELECT DISTINCT day FROM ud),
      |sk AS (SELECT day, hv FROM (
      |  SELECT day, hv, ROW_NUMBER() OVER (PARTITION BY day ORDER BY hv) AS rn
      |  FROM (SELECT DISTINCT day,
      |      CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)
      |        AS BIGINT) AS hv FROM ud)) WHERE rn <= 64),
      |wsk AS (SELECT DISTINCT CAST(t.w AS DATE) AS day, hv
      |  FROM sk, unnest(generate_series(CAST(day AS TIMESTAMP),
      |    CAST(day AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY)) t(w)
      |  WHERE CAST(t.w AS DATE) IN (SELECT day FROM days)),
      |est AS (SELECT day,
      |    CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
      |         ELSE 63.0 * 281474976710656 / CAST(hv AS DOUBLE) END AS kmv_wau
      |  FROM (SELECT day, hv, ROW_NUMBER() OVER (PARTITION BY day ORDER BY hv)
      |          AS rn, COUNT(*) OVER (PARTITION BY day) AS nd FROM wsk)
      |  WHERE rn = LEAST(nd, 64)),
      |w AS (SELECT CAST(t.w AS DATE) AS day, user_id
      |  FROM ud, unnest(generate_series(CAST(day AS TIMESTAMP),
      |    CAST(day AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY)) t(w)),
      |exact AS (SELECT w.day, COUNT(DISTINCT user_id) AS exact_wau
      |  FROM w JOIN days ON days.day = w.day GROUP BY 1)
      |SELECT day, exact_wau, kmv_wau,
      |  CAST(FLOOR(ABS(kmv_wau - exact_wau) * 1000000 / exact_wau) AS BIGINT)
      |    AS abs_err_ppm
      |FROM exact JOIN est USING (day) ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q192
  /** Theil–Sen robust trend of daily order revenue: the LOWER MEDIAN
    * of all pairwise day-to-day slopes — insensitive to ~29% outlier
    * days where a least-squares fit chases every spike. The pair join
    * runs over the DAY-GRAIN aggregate, so the quadratic blowup is
    * bounded by the calendar axis (3650 days → 6.7M pairs) REGARDLESS
    * of fact-table size — the broadcast pair-join never touches fact
    * rows. Each slope is ONE IEEE division of exact integers (cents
    * diff / day diff), so both engines produce bit-identical doubles
    * and the rank-selected median crosses engines exactly. */
  def theilSenTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((sum(dec(col("o_totalprice"), 12, 2)) * 100).cast("long")
        .as("cents"))
    val pairs = broadcast(daily.as("a"))
      .join(daily.as("b"), col("a.d") < col("b.d"))
      .select(((col("b.cents") - col("a.cents")).cast("double")
        / datediff(col("b.d"), col("a.d")).cast("double")).as("slope"))
    val meta = daily.agg(count(lit(1)).as("n_days"))
    // the lower median by GLOBAL rank — but computed as a two-level
    // rank over a range partitioning instead of one
    // Window.orderBy(slope) (which drags every pair into a single
    // partition: measured 4.0s at sf0.1, and at a 10-year axis the
    // 6.7M-pair sort would hit one executor). RangePartitioner
    // guarantees every value in partition i ≤ every value in i+1, so
    // global rank = per-partition rank + the partition's offset; ties
    // split across a boundary don't matter — the k-th VALUE is
    // identical under any tie arrangement.
    // persisted: the range boundaries come from SAMPLING, so the
    // counts action and the rank query must see the SAME partitioning
    // — recomputing would re-sample different boundaries and the
    // offsets would belong to a different layout. Not unpersisted here
    // (the returned DataFrame still reads it); the ContextCleaner
    // reclaims the cached RDD once the caller drops the result, and
    // the bench harness unpersists between timings
    val parts = pairs.repartitionByRange(32, col("slope"))
      .withColumn("p", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = parts.groupBy(col("p")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val np = counts.map(_._2).sum
    val k = (np + 1) / 2
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (p, c)) =>
      (p, acc + c) }.init.zip(counts).map { case ((_, off), (p, _)) => (p, off) }
    import s.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("p", "off"))
    parts
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p")).orderBy(col("slope"))))
      .join(offDf, "p")
      .filter(col("off") + col("rn") === k)
      .select(col("slope").as("median_slope_cents_per_day"),
        lit(np).as("n_pairs"))
      .crossJoin(meta)
  }

  val theilSenTrendSql: String =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |pairs AS (SELECT CAST(b.cents - a.cents AS DOUBLE)
      |    / CAST(date_diff('day', a.d, b.d) AS DOUBLE) AS slope
      |  FROM daily a JOIN daily b ON a.d < b.d),
      |ranked AS (SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
      |    COUNT(*) OVER () AS np FROM pairs)
      |SELECT slope AS median_slope_cents_per_day,
      |  CAST(np AS BIGINT) AS n_pairs,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days
      |FROM ranked WHERE rn = CAST(FLOOR((np + 1) / 2) AS BIGINT)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q189_forward_fill" -> (forwardFillRevenue _),
    "q190_rendezvous_routing" -> (rendezvousRouting _),
    "q191_rolling_kmv_wau" -> (rollingKmvWau _),
    "q192_theil_sen_trend" -> (theilSenTrend _),
    "q169_join_key_skew" -> (joinKeySkew _),
    "q167_mixture_drift" -> (mixtureDrift _),
    "q150_supplier_triangles" -> ((s: SparkSession, dir: String) =>
      supplierTriangles(s, dir, materialize = _.localCheckpoint())),
    "q148_revenue_autocorr" -> (revenueAutocorr _),
    "q145_revenue_cusum" -> (revenueCusum _),
    "q146_benford_audit" -> (benfordAudit _),
    "q138_histogram_quantiles" -> (histogramQuantiles _),
    // q139 is a single linear window chain since round 17 — no shared
    // subtree left to pin, so no localCheckpoint
    "q139_bipartite_rank" -> (bipartiteRank(_, _)),
    "q141_record_linkage" -> ((s: SparkSession, dir: String) =>
      recordLinkage(s, dir, materialize = _.localCheckpoint())),
    "q142_copurchase_lift" -> (copurchaseLift _),
    "q143_revenue_ewma" -> (revenueEwma _),
  )

  val oracles: Map[String, String] = Map(
    "q189_forward_fill" -> forwardFillRevenueSql,
    "q190_rendezvous_routing" -> rendezvousRoutingSql,
    "q191_rolling_kmv_wau" -> rollingKmvWauSql,
    "q192_theil_sen_trend" -> theilSenTrendSql,
    "q169_join_key_skew" -> joinKeySkewSql,
    "q167_mixture_drift" -> mixtureDriftSql,
    "q150_supplier_triangles" -> supplierTrianglesSql,
    "q148_revenue_autocorr" -> revenueAutocorrSql,
    "q145_revenue_cusum" -> revenueCusumSql,
    "q146_benford_audit" -> benfordAuditSql,
    "q138_histogram_quantiles" -> histogramQuantilesSql,
    "q139_bipartite_rank" -> bipartiteRankSql,
    "q141_record_linkage" -> recordLinkageSql,
    "q142_copurchase_lift" -> copurchaseLiftSql,
    "q143_revenue_ewma" -> revenueEwmaSql,
  )
}
