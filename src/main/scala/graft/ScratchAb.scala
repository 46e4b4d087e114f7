package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-timing probe for q135 (containmentPairs) — where do
  * the 4 seconds go? Not part of the suite; not committed. */
object ScratchAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.applyConfigs(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, dir, "documents")

    def time(label: String)(f: => Unit): Unit = {
      val reps = (1 to 5).map { _ =>
        System.gc(); Thread.sleep(100)
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s med ${reps.sorted.apply(reps.size / 2)}%.3f min ${reps.min}%.3f")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val n = 3
    def shPlain: DataFrame = docs.select(col("doc_id"), explode(array_distinct(
        when(size(split(col("text"), " ")) < n, array(col("text")))
          .otherwise(graft.functions.Native.wordNgrams(col("text"), n))))
      .as("g"))

    // full query (status quo)
    time("full containmentPairs") {
      val df = graft.llm.Dedup.containmentPairs(docs, 3, 0.6, 500,
        materialize = _.localCheckpoint())
      df.select(xxhash64(df.columns.map(col): _*).as("h")).agg(sum("h")).head()
    }
    // checkpoint build alone
    time("sh localCheckpoint build") {
      shPlain.localCheckpoint().count()
    }
    // shingle explode alone (no checkpoint)
    time("sh explode noop") {
      shPlain.write.format("noop").mode("overwrite").save()
    }
    // dfs + kept self-join + pair count, from a fresh checkpoint
    time("ckpt + dfs + kept pairs") {
      val sh = shPlain.localCheckpoint()
      val dfs = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val shK = sh.join(dfs.filter(col("df") <= 500).select(col("g")), Seq("g"))
      val kept = shK.select(col("doc_id").as("a"), col("g"))
        .join(shK.select(col("doc_id").as("b"), col("g")), Seq("g"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_kept"))
      kept.write.format("noop").mode("overwrite").save()
    }
    // ALTERNATIVE kept stage: per-shingle posting-list fold + in-row
    // pair generation (the q142/q150 pattern)
    time("ckpt + posting-fold pairs") {
      val sh = shPlain.localCheckpoint()
      val posts = sh.groupBy(col("g"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      val kept = posts
        .filter(size(col("ds")).between(2, 500))
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  transform(slice(ds, i + 2, size(ds)), y ->
            |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(count(lit(1)).as("n_kept"))
      kept.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
