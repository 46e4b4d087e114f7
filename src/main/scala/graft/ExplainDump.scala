package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Plan-evidence dumper for the optimization rounds: writes
  * `.explain("formatted")` for registered queries to text files, one
  * per query, so before/after plan claims in OPTIMIZATION_r*.md are
  * checkable without running Spark.
  *
  * {{{
  *   SPARK_GRAFT_EXPLAIN_DIR=plans/r17 SPARK_GRAFT_EXPLAIN_SUFFIX=before \
  *   SPARK_GRAFT_EXPLAIN_ONLY=q135,q150 sbt "runMain graft.ExplainDump"
  * }}}
  *
  * The dump runs under the same session tuning as [[Bench]] (same
  * configs, eager aggregation enabled with the suite's uniqueness
  * proofs) so the printed plan is the plan the bench actually times.
  * `explain("formatted")` shows the pre-execution plan — PushedFilters,
  * ReadSchema, join strategies, Exchange placement — which is the
  * evidence the optimization guide asks for; AQE runtime re-plans
  * (partition coalescing) are not visible here by construction.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_DIR", "plans/r17")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "before")
    val spark = graft.core.GraftSession.applyConfigs(
      org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]"),
      cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SuiteTuning.enableEagerAgg(spark, sfDir)
    Files.createDirectories(Paths.get(outDir))
    val only = sys.env.get("SPARK_GRAFT_EXPLAIN_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(f => f.exists(n.startsWith)))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val text = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          text.getBytes(StandardCharsets.UTF_8))
        println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[explain] $name ERROR ${e.getMessage}")
      } finally spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
