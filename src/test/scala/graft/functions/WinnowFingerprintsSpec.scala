package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The native winnow_fingerprints expression: bit-parity with the
  * higher-order-function formulation it replaced (which mirrors the
  * DuckDB oracle text), SQL-name resolution, codegen/interpreted
  * agreement, and the short-doc / null edges.
  */
class WinnowFingerprintsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("native == HOF formulation on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = graft.llm.TextStats.fingerprints(docs)
      .orderBy("doc_id").collect().toSeq
    val hof = graft.llm.TextStats.fingerprintsHof(docs)
      .orderBy("doc_id").collect().toSeq
    assert(native == hof)
  }

  test("native == HOF on edge docs: empty, short, exactly 8, BMP non-ASCII") {
    val docs = docsOf(Seq(
      "", "short", "12345678", "123456789",
      "café café résumé text here",
      "你好世界你好世界 more"))
    val native = graft.llm.TextStats.fingerprints(docs)
      .orderBy("doc_id").collect().toSeq
    val hof = graft.llm.TextStats.fingerprintsHof(docs)
      .orderBy("doc_id").collect().toSeq
    assert(native == hof)
  }

  test("resolves by name in SQL text; short doc yields empty array, null passes") {
    val got = spark.sql(
      "SELECT winnow_fingerprints('1234567'), winnow_fingerprints(CAST(NULL AS STRING))")
      .head()
    assert(got.getSeq[Long](0) == Seq.empty)
    assert(got.isNullAt(1))
  }

  test("codegen and interpreted paths agree") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaa", "12345678")
    val q = (df: org.apache.spark.sql.DataFrame) => df
      .select(call_function("winnow_fingerprints", col("text")).as("fps"))
      .collect().map(_.getSeq[Long](0)).toSeq
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

  test("every kept hash is a sampled polynomial of its window") {
    val text = "abcdefghijklmnopqrstuvwxyz0123456789"
    val fps = docsOf(Seq(text))
      .select(call_function("winnow_fingerprints", col("text")).as("fps"))
      .head().getSeq[Long](0)
    val mod = 2147483647L
    val pows = Iterator.iterate(1L)(x => x * 31 % mod).take(8).toSeq
    val expect = (0 to text.length - 8).map { i =>
      (0 until 8).map(k => text.charAt(i + k).toLong * pows(k)).sum % mod
    }.filter(_ % 16 == 0)
    assert(fps == expect)
  }
}
