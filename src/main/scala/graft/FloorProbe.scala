package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** TEMPORARY floor-attribution probe (round 18) — times trivial jobs
  * and q01's sink under the bench session to locate the per-query
  * floor. Not part of the suite. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.applyConfigs(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SuiteTuning.enableEagerAgg(spark, sfDir)

    val stageStats = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stageStats.add((i.numTasks,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)))
      }
    })

    def time(label: String, n: Int = 7)(f: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor] $label%-36s med ${ts.sorted.apply(n / 2)}%.3f min ${ts.min}%.3f max ${ts.max}%.3f")
    }

    // pure job overhead: 1-task job, no shuffle
    time("select 1 head")(spark.sql("SELECT 1").head())
    // 32-task scan-less job, no shuffle
    time("range 1e6 sum") {
      spark.range(1000000L).agg(sum("id")).head()
    }
    // one shuffle, 32 map + N reduce tasks
    time("range groupBy pmod") {
      spark.range(1000000L).groupBy(org.apache.spark.sql.functions.pmod(col("id"), org.apache.spark.sql.functions.lit(1000)))
        .agg(sum("id")).agg(sum("sum(id)")).head()
    }
    // q01 full (build+plan+exec, as timeOne does)
    time("q01 full timeOne") {
      val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      df.select(xxhash64(df.columns.map(col): _*).as("__h")).agg(sum("__h")).head()
    }
    // q01 exec only (df+sink built once outside)
    val df01 = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    val sink01 = df01.select(xxhash64(df01.columns.map(col): _*).as("__h")).agg(sum("__h"))
    time("q01 exec reused-plan")(sink01.head())
    // q04 (join chain)
    time("q04 full timeOne") {
      val df = SparkEntry.queries("q04_nation_revenue")(spark, sfDir)
      df.select(xxhash64(df.columns.map(col): _*).as("__h")).agg(sum("__h")).head()
    }
    // lineitem raw scan speed
    time("lineitem noop scan") {
      graft.core.Tables.load(spark, sfDir, "lineitem")
        .write.format("noop").mode("overwrite").save()
    }
    stageStats.clear()
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    df.select(xxhash64(df.columns.map(col): _*).as("__h")).agg(sum("__h")).head()
    val st = stageStats.toArray(Array.empty[(Int, Long)])
    println(s"[floor] q01 one run: ${st.length} stages, " +
      s"tasks=${st.map(_._1).mkString(",")} stageMs=${st.map(_._2).mkString(",")}")
    spark.stop()
  }
}
