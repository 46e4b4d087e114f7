package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.llm.Similarity

/** Native dot_product: bit-parity with the HOF fold it replaced
  * (float and double arrays, adversarial magnitudes where fold order
  * matters), null semantics (length mismatch, null element, null
  * array), codegen/interpreted agreement, SQL-name resolution. */
class DotProductSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bit-identical to the HOF fold on float arrays with adversarial magnitudes") {
    val rows = (1 to 500).map { i =>
      val a = Array.tabulate(16)(j => (if ((i + j) % 5 == 0) 1e8f else 1e-3f) * (j + 1))
      val b = Array.tabulate(16)(j => (if ((i + j) % 3 == 0) -1e7f else 2.5f) * (j % 4 + 1))
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      Similarity.dot(col("a"), col("b")).as("nat"),
      Similarity.dotHof(col("a"), col("b")).as("hof"))
      .filter(col("nat") =!= col("hof") ||
        col("nat").isNull =!= col("hof").isNull)
    assert(cmp.count() === 0L) // exact equality, not approx
  }

  test("double arrays and mixed float/double sides agree with the HOF fold") {
    val df = Seq((Array(0.1, 1e16, -1e16, 0.7), Array(3.0, 1.0, 1.0, 2.0)))
      .toDF("a", "b")
      .withColumn("bf", expr("transform(b, x -> CAST(x AS FLOAT))"))
    val r = df.select(
      Similarity.dot(col("a"), col("b")).as("dd"),
      Similarity.dotHof(col("a"), col("b")).as("ddh"),
      Similarity.dot(col("a"), col("bf")).as("dm"),
      Similarity.dotHof(col("a"), col("bf")).as("dmh")).head()
    assert(r.getDouble(0) === r.getDouble(1))
    assert(r.getDouble(2) === r.getDouble(3))
  }

  test("null semantics match zip_with padding: mismatch or null element -> null") {
    val df = Seq(
      (1L, Array(1.0, 2.0), Array(3.0, 4.0, 5.0)),     // length mismatch
      (2L, Array(1.0, 2.0), Array(3.0, 4.0)))          // clean
      .toDF("id", "a", "b")
    val got = df.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.dotHof(col("a"), col("b")).as("dh")).collect()
      .map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(got(1L) === ((true, true)))
    assert(got(2L) === ((false, false)))
    // null element poisons both the same way
    val withNull = spark.sql(
      "SELECT dot_product(array(1.0d, CAST(NULL AS DOUBLE)), array(2.0d, 3.0d)) AS d")
    assert(withNull.head().isNullAt(0))
    // null array -> null (nullSafeEval path)
    assert(spark.sql("SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .head().isNullAt(0))
  }

  test("codegen and interpreted agree; resolves by SQL name") {
    val df = (1 to 50).map(i => (Array.fill(8)(i * 0.5f), Array.fill(8)(1.5f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("dot_in")
    val viaSql = spark.sql("SELECT dot_product(a, b) AS d FROM dot_in")
      .as[Double].collect().toSeq
    val interpreted = df.collect().map { r =>
      val a = r.getSeq[Float](0); val b = r.getSeq[Float](1)
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    }.toSeq
    assert(viaSql === interpreted)
  }

  test("rejects non-numeric-array inputs at analysis time") {
    intercept[Exception] {
      Seq((Array("x"), Array(1.0))).toDF("a", "b")
        .select(graft.functions.Native.dotProduct(col("a"), col("b"))).head()
    }
  }
}
