package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The native minhash_signatures expression: bit-parity with the
  * higher-order-function formulation it replaced (which mirrors the
  * DuckDB oracle text), the degenerate-short-doc rule, and
  * codegen/interpreted agreement.
  */
class MinHashSignaturesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("native == HOF formulation on the fixture corpus (k=8, shingle=3)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = graft.llm.Dedup.minhashSignatures(docs, k = 8, shingle = 3)
      .orderBy("doc_id").collect().toSeq
    val hof = graft.llm.Dedup.minhashSignaturesHof(docs, k = 8, shingle = 3)
      .orderBy("doc_id").collect().toSeq
    assert(native == hof)
  }

  test("native == HOF on edges: empty, short (whole-text gram), repeats, unicode") {
    val docs = docsOf(Seq(
      "",                          // one empty word, below shingle width
      "two words",                 // below shingle width -> whole text
      "a b c",                     // exactly one 3-shingle
      "x y x y x y",               // repeated shingles collapse
      "café 你好 mixed ascii tail"))
    Seq((8, 3), (4, 2)).foreach { case (k, sh) =>
      val native = graft.llm.Dedup.minhashSignatures(docs, k, sh)
        .orderBy("doc_id").collect().toSeq
      val hof = graft.llm.Dedup.minhashSignaturesHof(docs, k, sh)
        .orderBy("doc_id").collect().toSeq
      assert(native == hof, s"k=$k shingle=$sh")
    }
  }

  test("codegen and interpreted paths agree; resolves by SQL name") {
    val viaSql = spark.sql(
      "SELECT minhash_signatures('the cat sat on the mat', 3, 8) AS m")
      .head().getSeq[Long](0)
    assert(viaSql.length == 8 && viaSql.forall(v => v >= 0))
    val texts = Seq("the quick brown fox jumps", "aa bb")
    val q = (df: org.apache.spark.sql.DataFrame) => df
      .select(call_function("minhash_signatures",
        col("text"), lit(3), lit(8)).as("m"))
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
}
