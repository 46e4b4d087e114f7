package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

class RetrySpec extends AnyFunSuite {

  test("fails twice then succeeds within the retry budget") {
    val sleeps = ArrayBuffer.empty[Long]
    var calls = 0
    val r = Retry.withBackoff(retries = 2, delayMs = 100, sleep = sleeps += _) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"flake $calls")
      "ok"
    }
    assert(r === "ok")
    assert(calls === 3)
    assert(sleeps.toSeq === Seq(100L, 200L)) // exponential backoff
  }

  test("exhausted retries rethrow the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(retries = 1, delayMs = 1, sleep = _ => ()) {
        calls += 1
        throw new RuntimeException(s"flake $calls")
      }
    }
    assert(calls === 2) // initial attempt + 1 retry
    assert(e.getMessage === "flake 2")
  }

  test("onRetry sees each attempt and its failure") {
    val seen = ArrayBuffer.empty[(Int, String)]
    intercept[RuntimeException] {
      Retry.withBackoff(retries = 2, delayMs = 1, sleep = _ => (),
        onRetry = (n, e) => seen += (n -> e.getMessage)) {
        throw new RuntimeException("boom")
      }
    }
    assert(seen.toSeq === Seq(1 -> "boom", 2 -> "boom"))
  }

  test("a throwing onRetry hook does not eat the remaining attempts") {
    var calls = 0
    val r = Retry.withBackoff(retries = 2, delayMs = 1, sleep = _ => (),
      onRetry = (_, _) => throw new RuntimeException("notifier down")) {
      calls += 1
      if (calls < 3) throw new RuntimeException("flake")
      "ok"
    }
    assert(r === "ok") // body still got all its retries
  }

  test("backoff doubling clamps at maxDelayMs instead of overflowing") {
    val sleeps = ArrayBuffer.empty[Long]
    intercept[RuntimeException] {
      Retry.withBackoff(retries = 80, delayMs = 300000L, sleep = sleeps += _,
        maxDelayMs = 900000L) {
        throw new RuntimeException("always")
      }
    }
    assert(sleeps.length === 80)
    assert(sleeps.forall(s => s > 0 && s <= 900000L), s"sleeps: ${sleeps.distinct}")
    assert(sleeps.take(3).toSeq === Seq(300000L, 600000L, 900000L))
  }

  test("fatal errors are not retried") {
    var calls = 0
    intercept[OutOfMemoryError] {
      Retry.withBackoff(retries = 3, delayMs = 1, sleep = _ => ()) {
        calls += 1
        throw new OutOfMemoryError("fatal")
      }
    }
    assert(calls === 1)
  }
}
