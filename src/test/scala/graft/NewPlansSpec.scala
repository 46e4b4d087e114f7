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
}
