package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.analytics.{Analytics, EventsQueries, MiningQueries, MvQueries, TypedQueries, WarehouseQueries}
import graft.llm.{CurationQueries, LlmQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's query registry. Each entry is an operator
  * from SURVEY.md §2 (or a driver-contract extension), paired in
  * [[oracleSql]] with the DuckDB-equivalent SQL for the correctness
  * gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ EventsQueries.queries ++ WarehouseQueries.queries ++
      LlmQueries.queries ++ TypedQueries.queries ++ MiningQueries.queries ++
      CurationQueries.queries ++ MvQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ EventsQueries.oracles ++ WarehouseQueries.oracles ++
      LlmQueries.oracles ++ TypedQueries.oracles ++ MiningQueries.oracles ++
      CurationQueries.oracles ++ MvQueries.oracles
}
