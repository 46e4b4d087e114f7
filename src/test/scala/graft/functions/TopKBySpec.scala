package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The bounded top-k aggregate: exact (ord DESC, payload ASC)
  * semantics vs a reference sort, partial/merge correctness across
  * partitions, tie-breaking, the fewer-than-k regime, and null
  * handling. Multi-partition runs exercise serialization.
  */
class TopKBySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ref(pairs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    pairs.distinct.sortBy { case (o, p) => (-o, p) }.take(k)

  private def run(pairs: Seq[(Long, Long)], k: Int, parts: Int): Seq[(Long, Long)] =
    pairs.toDF("o", "p").repartition(parts)
      .agg(Native.topKBy(col("o"), col("p"), k).as("tk"))
      .select(explode(col("tk")).as("e")).select("e.ord", "e.payload")
      .as[(Long, Long)].collect().toSeq

  test("keeps the k best by ord DESC, ties by payload ASC, across partitions") {
    val pairs = Seq.tabulate(5000)(i => (((i * 37) % 200).toLong, i.toLong))
    assert(run(pairs, 7, parts = 19) == ref(pairs, 7))
  }

  test("fewer rows than k returns everything, ordered") {
    val pairs = Seq((5L, 2L), (9L, 1L), (5L, 1L))
    assert(run(pairs, 10, parts = 3) == Seq((9L, 1L), (5L, 1L), (5L, 2L)))
  }

  test("grouped aggregation matches per-group reference") {
    val data = for (g <- 0 until 4; i <- 0 until 800)
      yield (g, ((i * 7919 + g) % 100).toLong, i.toLong)
    val got = data.toDF("g", "o", "p").repartition(11)
      .groupBy("g").agg(Native.topKBy(col("o"), col("p"), 3).as("tk"))
      .select(col("g"), explode(col("tk")).as("e"))
      .select(col("g"), col("e.ord"), col("e.payload"))
      .as[(Int, Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
    val want = data.groupBy(_._1).map { case (g, rows) =>
      g -> ref(rows.map(t => (t._2, t._3)), 3)
    }
    assert(got == want)
  }

  test("null ord or payload rows are ignored") {
    val df = Seq[(java.lang.Long, java.lang.Long)]((5L, 1L), (null, 2L), (7L, null))
      .toDF("o", "p")
    val got = df.agg(Native.topKBy(col("o"), col("p"), 5).as("tk"))
      .select(explode(col("tk")).as("e")).select("e.ord", "e.payload")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((5L, 1L)))
  }

  test("k < 1 is rejected") {
    intercept[IllegalArgumentException] { Native.topKBy(lit(1L), lit(1L), 0) }
  }
}
