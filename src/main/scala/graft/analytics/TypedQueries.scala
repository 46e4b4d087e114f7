package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TypedAggregators

/** Queries exercising the typed `Aggregator[IN, BUF, OUT]` surface
  * ([[graft.functions.TypedAggregators]]) through both registration
  * paths: the compile-time-typed `Dataset.groupByKey(...).agg` path and
  * the `udaf()`-registered SQL-text path.
  */
object TypedQueries {

  // ---------------------------------------------------------------- q102
  /** Revenue-weighted mean discount per return flag, via the TYPED path:
    * `Dataset[Li].groupByKey(_.flag).agg(agg.toColumn)`.
    *
    * Plan shape: ObjectHashAggregate with map-side partials — the
    * constant-size decimal buffer shuffles once on the 3-value group
    * key; the lineitem scan prunes to 3 columns. Exactness: both sums
    * are fixed-point decimal (order-independent); the one double
    * division happens per group in `finish`, so the result is
    * bit-identical to the DuckDB decimal oracle. */
  def weightedDiscount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = new TypedAggregators.WeightedMean[(String, Double, Double)](
      value = _._3, weight = _._2)
    Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_discount"))
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("wavg_discount"))
      .toDF("l_returnflag", "wavg_discount")
      .orderBy("l_returnflag")
  }

  val weightedDiscountSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS wavg_discount
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q103
  /** ASCII character-class census per language, via the UDAF path: the
    * same Aggregator registered with `functions.udaf` and invoked from
    * `spark.sql` text over a temp view — proving the typed aggregator
    * is a first-class SQL function.
    *
    * Null text is coalesced to '' BEFORE the aggregate on both engines
    * — Spark's typed-agg bridge skips null inputs, so the coalesce is
    * what keeps `n_docs` = COUNT(*) accountable for null-text docs.
    * One ObjectHashAggregate shuffle on `lang`; struct output flattened
    * to plain BIGINT columns for the gate. */
  def charProfileByLang(s: SparkSession, dir: String): DataFrame = {
    TypedAggregators.registerAll(s)
    Tables.load(s, dir, "documents").createOrReplaceTempView("documents")
    s.sql("SELECT lang, char_profile(coalesce(text, '')) AS p " +
        "FROM documents GROUP BY lang")
      .select(col("lang"), col("p.n_docs").as("n_docs"),
        col("p.n_alpha").as("n_alpha"), col("p.n_digit").as("n_digit"),
        col("p.n_space").as("n_space"))
      .orderBy("lang")
  }

  val charProfileByLangSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  COALESCE(CAST(SUM(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))) AS BIGINT), 0) AS n_alpha,
      |  COALESCE(CAST(SUM(length(regexp_replace(text, '[^0-9]', '', 'g'))) AS BIGINT), 0) AS n_digit,
      |  COALESCE(CAST(SUM(length(regexp_replace(text, '[^ \t\n\r]', '', 'g'))) AS BIGINT), 0) AS n_space
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q106
  /** Region/nation order totals planned by the COST-BASED optimizer
    * over ANALYZEd catalog tables ([[graft.operators.CatalogStats]]):
    * the four relations are registered as external parquet tables,
    * ANALYZE computes row counts + join-column NDVs, and the query
    * runs on a CBO child session (join reorder on) — so Catalyst
    * orders the dim chain from real cardinalities (25 nations, 5
    * regions) instead of file-size guesses. Results are identical to
    * the non-CBO plan; what changes is the plan's provenance, pinned
    * by [[graft.operators.CatalogStats.plannedRowCount]] in the spec. */
  def cboRegionOrderTotals(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CatalogStats
    val db = CatalogStats.registerAndAnalyze(s, dir,
      Seq("orders", "customer", "nation", "region"),
      statCols = Map(
        "orders" -> Seq("o_custkey"), "customer" -> Seq("c_custkey", "c_nationkey"),
        "nation" -> Seq("n_nationkey", "n_regionkey"), "region" -> Seq("r_regionkey")))
    CatalogStats.cboSession(s).sql(
      s"""SELECT r_name, n_name,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
         |  COUNT(*) AS n_orders
         |FROM $db.orders
         |JOIN $db.customer ON o_custkey = c_custkey
         |JOIN $db.nation ON c_nationkey = n_nationkey
         |JOIN $db.region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |ORDER BY r_name, n_name""".stripMargin)
  }

  val cboRegionOrderTotalsSql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_typed_weighted_discount" -> (weightedDiscount _),
    "q103_udaf_char_profile" -> (charProfileByLang _),
    "q106_cbo_region_order_totals" -> (cboRegionOrderTotals _))

  val oracles: Map[String, String] = Map(
    "q102_typed_weighted_discount" -> weightedDiscountSql,
    "q103_udaf_char_profile" -> charProfileByLangSql,
    "q106_cbo_region_order_totals" -> cboRegionOrderTotalsSql)
}
