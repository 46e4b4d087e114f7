package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The native simhash_fingerprint expression: bit-parity with the
  * higher-order-function fold it replaced (which mirrors the DuckDB
  * oracle text), split/md5 edge semantics, and codegen/interpreted
  * agreement.
  */
class SimHashExpressionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("native == HOF formulation on the fixture corpus (32 and 48 bits)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(32, 48).foreach { bits =>
      val native = graft.llm.Dedup.simhash(docs, bits)
        .orderBy("doc_id").collect().toSeq
      val hof = graft.llm.Dedup.simhashHof(docs, bits)
        .orderBy("doc_id").collect().toSeq
      assert(native == hof, s"bits=$bits")
    }
  }

  test("native == HOF on edges: empty, trailing spaces, repeats, unicode") {
    val docs = docsOf(Seq(
      "",                       // split -> [""], one empty word
      "word word word",         // distinct collapses to one vote
      "a b  c",                 // double space -> empty word in between
      "trailing space ",        // Spark split keeps the trailing empty
      "café 你好 mixed ascii"))
    val native = graft.llm.Dedup.simhash(docs, 32)
      .orderBy("doc_id").collect().toSeq
    val hof = graft.llm.Dedup.simhashHof(docs, 32)
      .orderBy("doc_id").collect().toSeq
    assert(native == hof)
  }

  test("codegen and interpreted paths agree; resolves by SQL name") {
    val got = spark.sql(
      "SELECT simhash_fingerprint('the cat sat', 32) AS s").head().getString(0)
    assert(got.length == 32 && got.forall(c => c == '0' || c == '1'))
    val texts = Seq("the quick brown fox", "aaa aaa bbb")
    val q = (df: org.apache.spark.sql.DataFrame) => df
      .select(call_function("simhash_fingerprint", col("text"), lit(32)).as("s"))
      .collect().map(_.getString(0)).toSeq
    val withCodegen = q(docsOf(texts))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevF = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(q(docsOf(texts)) == withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", prevF)
    }
  }

  test("non-literal bits is rejected") {
    val e = intercept[Exception] {
      docsOf(Seq("x")).selectExpr(
        "simhash_fingerprint(text, CAST(doc_id AS INT))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.toLowerCase.contains("foldable"))
  }
}
