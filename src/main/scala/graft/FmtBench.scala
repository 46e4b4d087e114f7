package graft

import org.apache.spark.sql.SparkSession

/** Focused at-rest-format A/B: the SAME lineitem rows as gzip
  * line-JSON vs zstd parquet twins under one catalog, each scan shape
  * timed with a warmup + `SPARK_GRAFT_BENCH_REPS` (default 5) reps,
  * MEDIANS reported — the single-shot MaintBench `fmt_*` rows bounce
  * with page-cache/JIT state, this is the reliable comparison (and the
  * measure of the round-15 vectorized parquet read path, which arms on
  * exactly these filter-free scans). One JSON line, Bench's shape. */
object FmtBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val nShards = sys.env.getOrElse("SPARK_GRAFT_MAINT_SHARDS", "32").toInt
    val spark = graft.core.GraftSession.applyConfigs(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = spark.newSession()
    c.conf.set("spark.sql.catalog.fb", "graft.sources.dsv2.GraftCatalog")
    c.conf.set("spark.sql.catalog.fb.root",
      java.nio.file.Files.createTempDirectory("graft-fmtbench").toString)
    c.sql("CREATE NAMESPACE fb.m")
    for (fmt <- Seq("jsonl", "parquet"))
      c.sql(
        s"""CREATE TABLE fb.m.li_$fmt
           |TBLPROPERTIES ('graft.format'='$fmt') AS
           |SELECT /*+ REPARTITION($nShards) */ *
           |FROM parquet.`$sfDir/lineitem.parquet`""".stripMargin)
    val shapes: Seq[(String, String => String)] = Seq(
      "full_agg" -> (t =>
        s"""SELECT l_returnflag, l_linestatus, count(*), sum(l_quantity),
           |  sum(l_extendedprice), avg(l_discount), max(l_shipdate)
           |FROM $t GROUP BY l_returnflag, l_linestatus""".stripMargin),
      "2col_projection" -> (t =>
        s"SELECT sum(l_extendedprice * (1 - l_discount)) FROM $t"),
      "filtered" -> (t =>
        s"SELECT count(*), sum(l_quantity) FROM $t WHERE l_returnflag = 'A'"))
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    for ((shape, q) <- shapes; fmt <- Seq("jsonl", "parquet")) {
      val sqlText = q(s"fb.m.li_$fmt")
      c.sql(sqlText).collect() // warmup
      val runs = (1 to reps).map { _ =>
        System.gc(); Thread.sleep(50L)
        val t0 = System.nanoTime()
        c.sql(sqlText).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      timings(s"${shape}_$fmt") =
        math.rint(runs(runs.size / 2) * 1000) / 1e3
    }
    val qjson = timings.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"fmt_ab","unit":"sec","queries":{$qjson},""" +
      s""""reps":$reps,"shards":$nShards,"sf":"$sfDir"}""")
    spark.stop()
  }
}
