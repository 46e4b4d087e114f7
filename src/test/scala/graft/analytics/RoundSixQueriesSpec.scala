package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.llm.LlmQueries

/** Algorithmic pins for the round-6 additions (q148–q154): each
  * clever plan shape must equal its naive reference on small data —
  * the sweep equals quadratic dominance, oriented wedges equal
  * brute-force triangles, the islands trick equals a hand-walked
  * streak, and the sketch-free integer forms behave as documented. */
class RoundSixQueriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q151: sort-and-sweep skyline == quadratic dominance anti-join") {
    import spark.implicits._
    val sky = Analytics.paretoSuppliers(spark, dir)
      .select("s_suppkey").as[Long].collect().toSet
    // naive reference: s is dominated iff some s' has >= rev, <= ret, one strict
    val sup = graft.core.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
          .as("rev"),
        sum(when(col("l_returnflag") === "R",
            (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
          .otherwise(0L)).as("ret"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = sup.filter { case (_, rev, ret) =>
      !sup.exists { case (_, r2, t2) =>
        r2 >= rev && t2 <= ret && (r2 > rev || t2 < ret) }
    }.map(_._1).toSet
    assert(sky == naive && sky.nonEmpty)
  }

  test("q150: oriented wedge enumeration == brute-force triangle count") {
    import spark.implicits._
    val viaQuery = MiningQueries.supplierTriangles(spark, dir)
      .as[(Long, Long)].collect().toMap
    // naive: materialize the thresholded edge set, count triangles per node
    val pairs = graft.core.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._1).values.flatMap { lines =>
        val sks = lines.map(_._2).sorted
        for (i <- sks.indices; j <- i + 1 until sks.length) yield (sks(i), sks(j))
      }.toSeq
    val edges = pairs.groupBy(identity).filter(_._2.size >= 4).keySet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      a <- nodes; b <- nodes if a < b && edges((a, b))
      c <- nodes if b < c && edges((b, c)) && edges((a, c))
    } { triCount(a) += 1; triCount(b) += 1; triCount(c) += 1 }
    val naiveTop = triCount.toSeq.sortBy { case (k, v) => (-v, k) }.take(20).toMap
    assert(viaQuery == naiveTop && viaQuery.nonEmpty)
  }

  test("q153: islands trick == hand-walked streaks") {
    import spark.implicits._
    val days = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-03"), // 3-streak
      (1L, "2024-01-05"),                                         // 1-streak
      (2L, "2024-02-10"), (2L, "2024-02-11"),                     // 2-streak
      (2L, "2024-02-11"),                                         // dup day
      (3L, "2024-03-01"))                                         // 1-streak
      .toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("timestamp").as("ts"))
    // run the same plan over an in-memory events-shaped frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    val got = days.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
      .groupBy(col("user_id")).agg(max(col("len")).as("m"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("q152: Gini-Simpson ppm is exact on a hand case") {
    import spark.implicits._
    // user 1: types a,a,b,b -> n=4, pairs=2+2=4, D = 1 - 4/12 = 2/3
    val ppm = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"))
      .toDF("user_id", "event_type")
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"), sum(col("c") * (col("c") - 1)).as("pairs"))
      .select(expr("1000000 - (1000000 * pairs) div (n * (n - 1))").as("ppm"))
      .as[Long].head()
    assert(ppm == 1000000L - 4000000L / 12L) // = 666667
  }

  test("q154: rarer query term contributes a higher idf") {
    import spark.implicits._
    val scored = LlmQueries.bm25Retrieval(spark, dir)
    val rows = scored.collect()
    assert(rows.length == 15 && rows.forall(_.getLong(1) > 0))
    // docs containing the rare term 'dup' must outrank pure common-term docs:
    // the top hit contains 'dup'
    val topDoc = rows.head.getLong(0)
    val hasDup = graft.core.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") === topDoc)
      .select(array_contains(split(col("text"), " "), "dup")).head().getBoolean(0)
    assert(hasDup)
  }

  test("q148: autocorrelation is in [-1, 1] and lag-rows complete") {
    val r = MiningQueries.revenueAutocorr(spark, dir).collect()
    assert(r.nonEmpty)
    assert(r.forall(row => math.abs(row.getDouble(3)) <= 1.0 + 1e-12))
    // every nation present carries all 7 lags
    val byNation = r.groupBy(_.getString(0))
    assert(byNation.values.forall(_.length == 7))
  }
}
