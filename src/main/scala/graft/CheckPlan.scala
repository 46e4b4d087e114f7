package graft
object CheckPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.applyConfigs(
      org.apache.spark.sql.SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, "/root/testdata/sf0.001")
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        val scans = "FileScan parquet".r.findAllMatchIn(p).size
        if (scans >= 4)
          println(s"AUDIT $name scans=$scans " +
            s"stages=${"ShuffleQueryStage".r.findAllMatchIn(p).size} " +
            s"reused=${"Reused".r.findAllMatchIn(p).size}")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage}") }
      finally spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    println("AUDIT done")
    spark.stop()
  }
}
