package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.LinkedHashMap

/** Benchmark main: times each registered query at SPARK_GRAFT_SF_DIR.
  *
  * One untimed warmup pass over the whole suite first (JVM + whole-stage
  * codegen + OS page cache — cold first-touch I/O dominated q02 in round
  * 1's numbers), then `SPARK_GRAFT_BENCH_REPS` timed runs per query
  * (default 3) reporting the per-query median. A failing query is
  * reported explicitly under "errors" — never folded into a timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = graft.core.GraftSession.applyConfigs(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = LinkedHashMap[String, String]()
    def timeOne(name: String): Option[Double] = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count()
            Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("\\s+", " ").take(200)
        None }
    }

    names.foreach(timeOne(_)) // warmup pass, discarded
    errors.clear()            // only report errors from timed runs
    val timings: Seq[(String, Option[Double])] = names.map { n =>
      val runs = (1 to reps).flatMap(_ => timeOne(n))
      n -> (if (runs.isEmpty) None else Some(runs.sorted.apply(runs.size / 2)))
    }

    val qs = timings.collect { case (k, Some(v)) => s"\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = f"${timings.flatMap(_._2).sum}%.3f"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
