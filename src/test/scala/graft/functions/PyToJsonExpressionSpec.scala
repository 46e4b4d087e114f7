package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The native py_to_json expression: SQL-name resolution through the
  * session extensions, codegen and interpreted parity, and equivalence
  * with the UDF form.
  */
class PyToJsonExpressionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val inputs = Seq(
    "[{'id': 'ou_1', 'name': 'Nguyen Van A'}]",
    "{'id': 'ou_2'}",
    "['a', 'b']",
    "None",
    "garbage-not-a-literal",
    null)

  test("resolves by name in SQL text via the session extensions") {
    val got = spark.sql(
      "SELECT py_to_json(\"[{'text': 50000}]\") AS j").head().getString(0)
    assert(got == """[{"text":50000}]""")
  }

  test("native expression == UDF on valid, garbage, and null input") {
    val df = inputs.toDF("s")
    val native = df.select(LarkFunctions.pyToJson(col("s"))).collect()
      .map(r => Option(r.getString(0)))
    val viaUdf = df.select(LarkFunctions.pyToJsonUdf(col("s"))).collect()
      .map(r => Option(r.getString(0)))
    assert(native.toSeq == viaUdf.toSeq)
    assert(native(4).isEmpty && native(5).isEmpty) // garbage + null -> null
  }

  test("codegen and interpreted paths agree") {
    val df = inputs.toDF("s").select(LarkFunctions.pyToJson(col("s")).as("j"))
    val withCodegen = df.collect().map(r => Option(r.getString(0))).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = inputs.toDF("s")
        .select(LarkFunctions.pyToJson(col("s")).as("j"))
        .collect().map(r => Option(r.getString(0))).toSeq
      assert(interpreted == withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
