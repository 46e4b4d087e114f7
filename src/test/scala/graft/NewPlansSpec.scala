package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan guards for the round-6 additions: the shapes the scale notes
  * promise must actually appear in the executed plan. */
class NewPlansSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString.toLowerCase

  test("q122: overlap join is an equi join (no nested-loop/cartesian), months broadcast") {
    val p = plan("q122_order_span_months")
    assert(!p.contains("nestedloop") && !p.contains("cartesian"), p.take(2000))
    assert(p.contains("broadcasthashjoin"), p.take(2000))
  }

  test("q123: pool side broadcast; bounded-heap aggregate, no window sort") {
    val p = plan("q123_negative_pairs")
    assert(p.contains("broadcast"), p.take(2000))
    assert(p.contains("topk_by"), p.take(2000))
    assert(!p.contains("window"), p.take(2000))
  }

  test("q124: single aggregate pass, no Expand, bounded postings heap") {
    val p = plan("q124_inverted_index")
    assert(!p.contains("expand"), p.take(2000))
    assert(p.contains("topk_by"), p.take(2000))
  }

  test("q126: broadcast pool, bounded-heap ranking, no window sort") {
    val p = plan("q126_hard_negatives")
    assert(p.contains("broadcast"), p.take(2000))
    assert(p.contains("topk_by"), p.take(2000))
    assert(!p.contains("window"), p.take(2000))
  }

  test("q125/q129: top-N plans as TakeOrderedAndProject, never a global sort") {
    for (q <- Seq("q125_bpe_pairs", "q129_pmi_collocations")) {
      val p = plan(q)
      assert(p.contains("takeorderedandproject"), s"$q: ${p.take(2000)}")
    }
  }

  test("q130: one ObjectHashAggregate pass with map-side partials, idx broadcast") {
    val p = plan("q130_embedding_gram")
    assert(p.contains("objecthashaggregate"), p.take(2000))
    assert(p.contains("partial"), p.take(2000))
    assert(p.contains("broadcast"), p.take(2000))
    // the corpus is read once: a single parquet scan of embeddings
    assert("filescan parquet|batchscan|scan parquet".r
      .findAllMatchIn(p).size <= 2, p.take(2000))
  }

  test("q131: margin joined broadcast; single window over user partitions") {
    val p = plan("q131_markov_transitions")
    assert(p.contains("broadcasthashjoin"), p.take(2000))
    assert(!p.contains("sortmergejoin"), p.take(2000))
    // the lag window partitions by user_id and nothing else windows —
    // (the subtree prints twice: the margin side shares it, and the
    // identical exchange is deduped at runtime by ReuseExchange)
    val windows = p.linesIterator.filter(_.contains("window [")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("[user_id")),
      windows.mkString("\n"))
  }
}
