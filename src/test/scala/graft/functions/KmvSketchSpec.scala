package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The KMV distinct sketch aggregate: exact k-smallest-distinct
  * semantics vs a reference computation, partial/merge correctness
  * across many partitions, the fewer-than-k exact regime, null
  * handling, and serialization round-trip (exercised implicitly by
  * multi-partition aggregation, which ships serialized buffers).
  */
class KmvSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketch(values: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    val df = values.toDF("v").repartition(parts)
    df.agg(Native.kmvSketch(col("v"), k).as("s"))
      .collect()(0).getSeq[Long](0)
  }

  test("keeps the k smallest DISTINCT values, sorted, over many partitions") {
    val vals = Seq.tabulate(10000)(i => ((i * 2654435761L) % 100000) + 1)
    val expected = vals.distinct.sorted.take(64)
    assert(sketch(vals, 64, parts = 17) == expected)
  }

  test("fewer than k distinct values: the array IS the distinct set") {
    val vals = Seq.fill(500)(Seq(7L, 3L, 9L, 3L, 7L)).flatten
    assert(sketch(vals, 32, parts = 8) == Seq(3L, 7L, 9L))
  }

  test("nulls are ignored; all-null group yields an empty array") {
    val df = Seq[(Integer, java.lang.Long)]((1, 5L), (1, null), (2, null))
      .toDF("g", "v")
    val rows = df.groupBy("g")
      .agg(Native.kmvSketch(col("v").cast("long"), 4).as("s"))
      .orderBy("g").collect()
    assert(rows(0).getSeq[Long](1) == Seq(5L))
    assert(rows(1).getSeq[Long](1) == Seq.empty[Long])
  }

  test("grouped aggregation matches per-group reference") {
    val data = for (g <- 0 until 5; i <- 0 until 1000)
      yield (g, ((i * 40503L + g * 7919L) % 3000) + 1)
    val df = data.toDF("g", "v").repartition(13)
    val got = df.groupBy("g").agg(Native.kmvSketch(col("v"), 16).as("s"))
      .orderBy("g").collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val want = data.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(16)
    }
    assert(got == want)
  }

  test("estimator tracks true cardinality within KMV error bounds") {
    // 48-bit md5-prefix hash of 20k distinct ids; relative error of
    // (k-1)H/h_k concentrates around 1/sqrt(k-2) ~ 13% at k=64
    val n = 20000
    val df = (1 to n).toDF("id")
      .select(conv(substring(md5(col("id").cast("string")), 1, 12), 16, 10)
        .cast("long").as("h"))
    val arr = df.agg(Native.kmvSketch(col("h"), 64).as("s"))
      .collect()(0).getSeq[Long](0)
    val est = 63.0 * (1L << 48) / arr.last.toDouble
    assert(math.abs(est - n) / n < 0.5, s"estimate $est for true $n")
  }

  test("mergeable: k-smallest of two sketches == sketch of the union") {
    // the property q132's set algebra stands on — set operations run
    // on two k-long arrays, never the populations
    val k = 16
    val a = Seq.tabulate(3000)(i => ((i * 2654435761L) % 50000) + 1)
    val b = Seq.tabulate(3000)(i => ((i * 40503L + 13) % 50000) + 1)
    val sa = sketch(a, k, parts = 7)
    val sb = sketch(b, k, parts = 5)
    val mergedFromSketches = (sa ++ sb).distinct.sorted.take(k)
    assert(mergedFromSketches == sketch(a ++ b, k, parts = 11))
  }

  test("k < 2 is rejected") {
    intercept[IllegalArgumentException] {
      Native.kmvSketch(lit(1L), 1)
    }
  }
}
