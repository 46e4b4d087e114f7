package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BpeTrainerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trains the classic low/lower corpus like the reference algorithm") {
    // Sennrich et al.'s running example, collapsed to a corpus:
    // low x5, lower x2, newest x6, widest x3
    val text =
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val model = BpeTrainer.train(docs, nMerges = 4)
    // round 1: es (6+3=9); round 2: est (9); round 3: lo (7);
    // round 4: low (7)
    assert(model.merges === Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w")))
    val segs = model.words.collect()
      .map(r => r.getAs[String]("w") -> r.getSeq[String](2)).toMap
    assert(segs("low") === Seq("low"))
    assert(segs("lower") === Seq("low", "e", "r"))
    assert(segs("newest") === Seq("n", "e", "w", "est"))
    assert(segs("widest") === Seq("w", "i", "d", "est"))
  }

  test("greedy left-to-right: aaa under (a,a) becomes [aa, a]") {
    val docs = Seq((1L, "aaa aaa aaaa")).toDF("doc_id", "text")
    val model = BpeTrainer.train(docs, nMerges = 1)
    assert(model.merges === Seq(("a", "a")))
    val segs = model.words.collect()
      .map(r => r.getAs[String]("w") -> r.getSeq[String](2)).toMap
    assert(segs("aaa") === Seq("aa", "a"))
    assert(segs("aaaa") === Seq("aa", "aa"))
  }

  test("training is partitioning-invariant") {
    val docs = (0L until 50L)
      .map(i => (i, s"alpha beta gamma${i % 3} alpha beta"))
      .toDF("doc_id", "text")
    val m1 = BpeTrainer.train(docs, nMerges = 6).merges
    val m2 = BpeTrainer.train(docs.repartition(11), nMerges = 6).merges
    assert(m1 === m2)
    assert(m1.length === 6)
  }

  test("minCount stops training before degenerate merges") {
    val docs = Seq((1L, "ab ab xy")).toDF("doc_id", "text")
    val model = BpeTrainer.train(docs, nMerges = 10, minCount = 2L)
    // only (a,b) reaches count 2; (x,y) is 1 and must not merge
    assert(model.merges === Seq(("a", "b")))
  }

  test("encode reassembles token order and falls back to chars for OOV") {
    val train = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val model = BpeTrainer.train(train, nMerges = 2)
    // merges: (l,o) 3, then (lo,w) 3
    assert(model.merges === Seq(("l", "o"), ("lo", "w")))
    val out = BpeTrainer.encode(
      Seq((7L, "lower low zap")).toDF("doc_id", "text"), model).collect()
    assert(out.length === 1)
    assert(out(0).getSeq[String](1) ===
      Seq("low", "e", "r", "low", "z", "a", "p"))
    assert(out(0).getAs[Long]("n_tokens") === 7L)
  }
}
