package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Native squared_l2: bit-parity with the HOF fold, null semantics,
  * SQL-name resolution. */
class SquaredL2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the HOF fold, float and double") {
    val rows = (1 to 300).map { i =>
      (Array.tabulate(12)(j => (i * 31 + j * 7 % 13) * 0.37),
       Array.tabulate(12)(j => (i * 17 - j * 3 % 11) * 1.13e5))
    }
    val df = rows.toDF("a", "b")
      .withColumn("af", expr("transform(a, x -> CAST(x AS FLOAT))"))
    val bad = df.select(
      Native.squaredL2(col("a"), col("b")).as("n"),
      hof(col("a"), col("b")).as("h"),
      Native.squaredL2(col("af"), col("b")).as("nm"),
      hof(expr("transform(af, x -> CAST(x AS DOUBLE))"), col("b")).as("hm"))
      .filter(col("n") =!= col("h") || col("nm") =!= col("hm"))
    assert(bad.count() === 0L)
  }

  test("null on mismatch or null element; resolves by SQL name") {
    assert(spark.sql("SELECT squared_l2(array(1.0d), array(1.0d, 2.0d)) AS d")
      .head().isNullAt(0))
    assert(spark.sql(
      "SELECT squared_l2(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS d")
      .head().isNullAt(0))
    assert(spark.sql("SELECT squared_l2(array(3.0d), array(1.0d)) AS d")
      .head().getDouble(0) === 4.0)
  }
}
