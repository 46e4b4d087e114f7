package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[EagerAggregation]] — the stats-proven partial push-down of
  * aggregates through joins: fires only on ANALYZE-verified-unique,
  * fingerprint-fresh dim keys; results must be EXACTLY the un-rewritten
  * plan's, and every unproven/unsupported shape stands down. */
class EagerAggregationSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.ea", "graft.sources.dsv2.GraftCatalog")
    s.conf.set("spark.sql.catalog.ea.root",
      java.nio.file.Files.createTempDirectory("graft-ea").toString)
    s.sql("CREATE NAMESPACE IF NOT EXISTS ea.ns")
    // fact: duplicate fks, null fks, two group dims, values with nulls
    s.sql("""CREATE TABLE ea.ns.fact (fk BIGINT, seg STRING, qty BIGINT,
            |  price DOUBLE)""".stripMargin)
    s.sql("""INSERT INTO ea.ns.fact SELECT
            |  CASE WHEN id % 11 = 3 THEN NULL ELSE id % 500 END,
            |  CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b'
            |       ELSE 'c' END,
            |  CASE WHEN id % 7 = 2 THEN NULL ELSE id % 97 END,
            |  id * 0.25
            |FROM range(0, 20000)""".stripMargin)
    // dim: unique pk 0..699 (some fact fks dangle: inner join drops)
    s.sql("CREATE TABLE ea.ns.dim (pk BIGINT, grp STRING, w BIGINT)")
    s.sql("""INSERT INTO ea.ns.dim SELECT id,
            |  concat('g', CAST(id % 5 AS STRING)), id * 10
            |FROM range(0, 700) WHERE id % 13 != 6""".stripMargin)
    s.sql("CALL ea.system.analyze_table('ns.dim', unique_candidates => 'pk')")
    s
  }

  private val q =
    """SELECT grp, seg,
      |  SUM(qty) AS sq,
      |  SUM(CAST(price AS DECIMAL(14,4))) AS sp,
      |  MIN(qty) AS mn, MAX(price) AS mx,
      |  COUNT(*) AS n, COUNT(qty) AS nq
      |FROM ea.ns.fact JOIN ea.ns.dim ON fk = pk
      |GROUP BY grp, seg ORDER BY grp, seg""".stripMargin

  private def withRule[T](on: Boolean)(body: => T): T = {
    spark.conf.set("spark.graft.eagerAgg.enabled", on.toString)
    // the cost guard stands down when the dim would BROADCAST (the
    // pre-agg only pays on shuffle joins) — these tests assert the
    // rewrite itself, so pin the shuffle-join world
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally {
      spark.conf.unset("spark.graft.eagerAgg.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  private def aggsBelowJoin(df: org.apache.spark.sql.DataFrame): Boolean = {
    val plan = df.queryExecution.optimizedPlan
    plan.collect { case j: Join =>
      j.children.exists(c => c.collectFirst { case a: Aggregate => a }
        .isDefined)
    }.exists(identity)
  }

  test("the rewrite fires on a proven-unique dim key and results are " +
      "EXACTLY the un-rewritten plan's (all four agg kinds + counts)") {
    val off = withRule(on = false)(spark.sql(q).collect().toSeq)
    withRule(on = true) {
      val df = spark.sql(q)
      assert(aggsBelowJoin(df),
        s"partial aggregate not pushed below the join:\n" +
          df.queryExecution.optimizedPlan)
      assert(df.collect().toSeq == off,
        "eager aggregation changed results")
    }
    assert(off.nonEmpty)
  }

  test("global aggregate (no GROUP BY) and fact-side-only grouping both " +
      "rewrite exactly") {
    val g1 = "SELECT SUM(qty) AS s, COUNT(*) AS n " +
      "FROM ea.ns.fact JOIN ea.ns.dim ON fk = pk"
    val g2 = "SELECT seg, SUM(qty) AS s FROM ea.ns.fact " +
      "JOIN ea.ns.dim ON fk = pk GROUP BY seg ORDER BY seg"
    for (sql <- Seq(g1, g2)) {
      val off = withRule(on = false)(spark.sql(sql).collect().toSeq)
      withRule(on = true) {
        val df = spark.sql(sql)
        assert(aggsBelowJoin(df), s"no push for: $sql")
        assert(df.collect().toSeq == off, s"results moved for: $sql")
      }
    }
  }

  test("stand-downs: unverified key, distinct agg, unsupported agg, " +
      "dim-side agg input, conf off") {
    withRule(on = true) {
      // join on the dim's UNVERIFIED column (w): no premise, no push
      val unverified = spark.sql("SELECT grp, SUM(qty) AS s FROM ea.ns.fact " +
        "JOIN ea.ns.dim ON fk = w GROUP BY grp")
      assert(!aggsBelowJoin(unverified), "pushed without a uniqueness proof")
      // DISTINCT aggregates stand down
      val distinct = spark.sql("SELECT grp, COUNT(DISTINCT qty) AS d " +
        "FROM ea.ns.fact JOIN ea.ns.dim ON fk = pk GROUP BY grp")
      assert(!aggsBelowJoin(distinct), "pushed a distinct aggregate")
      // TRY-mode SUM stands down: a partial group's overflow-NULL
      // would be silently skipped by the outer SUM where single-level
      // try_sum NULLs the whole group
      val trySum = spark.sql("SELECT grp, TRY_SUM(qty) AS t " +
        "FROM ea.ns.fact JOIN ea.ns.dim ON fk = pk GROUP BY grp")
      assert(!aggsBelowJoin(trySum), "pushed a try_sum aggregate")
      // AVG is not in the supported fold set
      val avg = spark.sql("SELECT grp, AVG(qty) AS a FROM ea.ns.fact " +
        "JOIN ea.ns.dim ON fk = pk GROUP BY grp")
      assert(!aggsBelowJoin(avg), "pushed an unsupported aggregate")
      // aggregate over a DIM column: nothing to push fact-side
      val dimAgg = spark.sql("SELECT seg, SUM(w) AS sw FROM ea.ns.fact " +
        "JOIN ea.ns.dim ON fk = pk GROUP BY seg")
      assert(!aggsBelowJoin(dimAgg), "pushed a dim-side aggregate")
    }
    withRule(on = false) {
      assert(!aggsBelowJoin(spark.sql(q)), "rule ran while disabled")
    }
  }

  test("cost guard: a broadcast-able dim stands down (the pre-agg " +
      "would add a shuffle the broadcast join never needed)") {
    spark.conf.set("spark.graft.eagerAgg.enabled", "true")
    try {
      // default broadcast threshold: the ~650-row dim will broadcast
      val df = spark.sql(q)
      assert(!aggsBelowJoin(df),
        "rewrote a broadcast-class join:\n" + df.queryExecution.optimizedPlan)
    } finally spark.conf.unset("spark.graft.eagerAgg.enabled")
  }

  test("stale-stats conservatism: a dim append withdraws the premise; " +
      "re-ANALYZE restores it") {
    // a fresh dim table so staleness here can't affect other tests
    spark.sql("CREATE TABLE ea.ns.dim2 (pk BIGINT, grp STRING)")
    spark.sql(
      "INSERT INTO ea.ns.dim2 SELECT id, concat('g', CAST(id % 3 AS STRING)) " +
        "FROM range(0, 500)")
    spark.sql("CALL ea.system.analyze_table('ns.dim2', " +
      "unique_candidates => 'pk')")
    val sql2 = "SELECT grp, SUM(qty) AS s FROM ea.ns.fact " +
      "JOIN ea.ns.dim2 ON fk = pk GROUP BY grp ORDER BY grp"
    withRule(on = true) {
      assert(aggsBelowJoin(spark.sql(sql2)), "fresh proof must push")
      // the append makes the fingerprint stale — AND introduces a
      // duplicate pk, exactly the hazard the conservatism exists for
      spark.sql("INSERT INTO ea.ns.dim2 VALUES (7, 'dup')")
      val df = spark.sql(sql2)
      assert(!aggsBelowJoin(df), "stale uniqueness premise still pushed")
      val off = withRule(on = false)(spark.sql(sql2).collect().toSeq)
      assert(df.collect().toSeq == off)
      // re-ANALYZE now FAILS the uniqueness probe (pk 7 is duplicated):
      // the column must not come back verified
      spark.sql("CALL ea.system.analyze_table('ns.dim2', " +
        "unique_candidates => 'pk')")
      assert(!aggsBelowJoin(spark.sql(sql2)),
        "a duplicated key must not re-verify")
    }
  }

  test("property: seeded random fact/dim populations — rewritten " +
      "results identical to the un-rewritten plan across shapes") {
    val rnd = new scala.util.Random(20260816L)
    for (round <- 0 until 4) {
      val nFact = 2000 + rnd.nextInt(3000)
      val nDim = 50 + rnd.nextInt(400)
      val nullPct = rnd.nextInt(30)
      spark.sql(s"DROP TABLE IF EXISTS ea.ns.pf$round")
      spark.sql(s"DROP TABLE IF EXISTS ea.ns.pd$round")
      spark.sql(s"CREATE TABLE ea.ns.pf$round (fk BIGINT, g STRING, v BIGINT)")
      spark.sql(
        s"""INSERT INTO ea.ns.pf$round SELECT
           |  CASE WHEN id % 100 < $nullPct THEN NULL
           |       ELSE CAST(hash(id) % ${nDim * 2} AS BIGINT) END,
           |  concat('s', CAST(id % 4 AS STRING)),
           |  CASE WHEN id % 9 = 5 THEN NULL ELSE id % 1000 END
           |FROM range(0, $nFact)""".stripMargin)
      spark.sql(s"CREATE TABLE ea.ns.pd$round (pk BIGINT, dg STRING)")
      spark.sql(
        s"""INSERT INTO ea.ns.pd$round SELECT id - $nDim,
           |  concat('d', CAST(id % 3 AS STRING))
           |FROM range(0, ${2 * nDim}) WHERE id % 7 != 2""".stripMargin)
      spark.sql(s"CALL ea.system.analyze_table('ns.pd$round', " +
        "unique_candidates => 'pk')")
      val shapes = Seq(
        s"SELECT dg, SUM(v) AS s, COUNT(*) AS n FROM ea.ns.pf$round " +
          s"JOIN ea.ns.pd$round ON fk = pk GROUP BY dg ORDER BY dg",
        s"SELECT g, dg, MIN(v) AS mn, MAX(v) AS mx, COUNT(v) AS nv " +
          s"FROM ea.ns.pf$round JOIN ea.ns.pd$round ON fk = pk " +
          "GROUP BY g, dg ORDER BY g, dg",
        s"SELECT SUM(v * 2 + 1) AS sx FROM ea.ns.pf$round " +
          s"JOIN ea.ns.pd$round ON fk = pk")
      for (qq <- shapes) {
        val off = withRule(on = false)(spark.sql(qq).collect().toSeq)
        withRule(on = true) {
          val df = spark.sql(qq)
          assert(aggsBelowJoin(df), s"round $round no push: $qq")
          assert(df.collect().toSeq == off, s"round $round diverged: $qq")
        }
      }
    }
  }

  test("verified-unique dim behind Filter and pass-through Project " +
      "still proves; an aliased/computed key does not") {
    withRule(on = true) {
      val filtered = spark.sql(
        """SELECT grp, SUM(qty) AS s FROM ea.ns.fact
          |JOIN (SELECT pk, grp FROM ea.ns.dim WHERE w >= 0) d ON fk = d.pk
          |GROUP BY grp""".stripMargin)
      assert(aggsBelowJoin(filtered),
        "filter/projection over the dim must preserve the proof")
      // NB: `pk + 0` would constant-fold back to the attribute before
      // the rule runs (legitimately provable) — use a non-injective
      // expression, which must never inherit the proof
      val computed = spark.sql(
        """SELECT grp, SUM(qty) AS s FROM ea.ns.fact
          |JOIN (SELECT pk % 100 AS pk2, grp FROM ea.ns.dim) d ON fk = d.pk2
          |GROUP BY grp""".stripMargin)
      assert(!aggsBelowJoin(computed),
        "a computed key column must not inherit the proof")
    }
  }
}
