package graft.sources

import scala.util.control.NonFatal

/** Bounded retry with backoff for the ingestion edge.
  *
  * The reference schedules its ingestion under Airflow default_args
  * `retries` + `retry_delay` (reference: dags/etl/run_etl.py:19-23 —
  * one retry after 5 minutes); this is that policy as a library
  * function, with the clock injectable so tests don't sleep.
  */
object Retry {

  /** Run `body`, retrying up to `retries` times on non-fatal failure.
    * Attempt n sleeps `min(delayMs * 2^(n-1), maxDelayMs)` first (n=1
    * sleeps `delayMs`, matching the reference's fixed retry_delay for
    * the single-retry default, and backing off under repeated flake;
    * the cap keeps the doubling from overflowing Long on high attempt
    * counts). `onRetry` fires before each sleep with (attempt,
    * failure) — the notifier seam; a THROWING hook must not eat the
    * remaining attempts, so its failure is swallowed (the retry policy
    * answers to the body's errors, not the observer's). */
  def withBackoff[T](retries: Int, delayMs: Long,
                     sleep: Long => Unit = Thread.sleep,
                     onRetry: (Int, Throwable) => Unit = (_, _) => (),
                     maxDelayMs: Long = 60L * 60 * 1000)
                    (body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case NonFatal(e) if attempt < retries =>
          attempt += 1
          try onRetry(attempt, e) catch { case NonFatal(_) => }
          val exp = math.min(attempt - 1, 62)
          val backoff =
            if (exp >= 62 || delayMs > (maxDelayMs >> exp)) maxDelayMs
            else delayMs << exp
          sleep(math.min(backoff, maxDelayMs))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
