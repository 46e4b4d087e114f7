package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MergeUpsertSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def target = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
  private def source = Seq((2, "B"), (4, "D")).toDF("id", "v")

  test("matched rows replaced, unmatched inserted, rest untouched") {
    val got = MergeUpsert(target, source, Seq("id"))
      .orderBy("id").as[(Int, String)].collect().toSeq
    assert(got === Seq((1, "a"), (2, "B"), (3, "c"), (4, "D")))
  }

  test("composite key upsert") {
    val t = Seq((1, "x", 10), (1, "y", 20)).toDF("k1", "k2", "v")
    val s = Seq((1, "y", 99), (2, "z", 5)).toDF("k1", "k2", "v")
    val got = MergeUpsert(t, s, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Int, String, Int)].collect().toSeq
    assert(got === Seq((1, "x", 10), (1, "y", 99), (2, "z", 5)))
  }

  test("intoPath creates then upserts a parquet target atomically") {
    val dir = java.nio.file.Files.createTempDirectory("merge").toString + "/t"
    MergeUpsert.intoPath(spark, dir, target, Seq("id"))
    MergeUpsert.intoPath(spark, dir, source, Seq("id"))
    val got = spark.read.parquet(dir).orderBy("id").as[(Int, String)].collect().toSeq
    assert(got === Seq((1, "a"), (2, "B"), (3, "c"), (4, "D")))
    // no staging/old leftovers
    val parent = new java.io.File(dir).getParentFile.list().toSeq
    assert(parent === Seq("t"))
  }
}
