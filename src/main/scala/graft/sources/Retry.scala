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
    * Attempt n sleeps `delayMs * 2^(n-1)` first (n=1 sleeps `delayMs`,
    * matching the reference's fixed retry_delay for the single-retry
    * default, and backing off under repeated flake). `onRetry` fires
    * before each sleep with (attempt, failure) — the notifier seam. */
  def withBackoff[T](retries: Int, delayMs: Long,
                     sleep: Long => Unit = Thread.sleep,
                     onRetry: (Int, Throwable) => Unit = (_, _) => ())
                    (body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case NonFatal(e) if attempt < retries =>
          attempt += 1
          onRetry(attempt, e)
          sleep(delayMs << (attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
