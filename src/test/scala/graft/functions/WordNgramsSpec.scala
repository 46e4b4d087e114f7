package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The native word_ngrams expression: bit-parity with the HOF
  * `transform(sequence(...), i -> array_join(slice(...)))` SQL shape
  * it replaced, plus edges and codegen/interpreted agreement.
  */
class WordNgramsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def hof(n: Int) = expr(
    s"""CASE WHEN size(split(text, ' ')) < $n THEN array()
       |ELSE transform(sequence(1, size(split(text, ' ')) - ${n - 1}),
       |       i -> array_join(slice(split(text, ' '), i, $n), ' '))
       |END""".stripMargin)

  test("native == HOF on the fixture corpus and edges") {
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edges = docsOf(Seq(
      "", "one", "a b", "a b c", "a b  c d",   // incl. double space
      "trailing space ", "café 你好 x y z"))
    Seq(fixture, edges).foreach { docs =>
      Seq(2, 3, 8).foreach { n =>
        val got = docs.select(col("doc_id"),
          call_function("word_ngrams", col("text"), lit(n)).as("g"))
          .orderBy("doc_id").collect().map(_.getSeq[String](1)).toSeq
        val want = docs.select(col("doc_id"), hof(n).as("g"))
          .orderBy("doc_id").collect().map(_.getSeq[String](1)).toSeq
        assert(got == want, s"n=$n")
      }
    }
  }

  test("codegen and interpreted paths agree; resolves by SQL name") {
    val viaSql = spark.sql("SELECT word_ngrams('a b c d', 2) AS g")
      .head().getSeq[String](0)
    assert(viaSql == Seq("a b", "b c", "c d"))
    val texts = Seq("the quick brown fox", "x")
    val q = (df: org.apache.spark.sql.DataFrame) => df
      .select(call_function("word_ngrams", col("text"), lit(3)).as("g"))
      .collect().map(_.getSeq[String](0)).toSeq
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
