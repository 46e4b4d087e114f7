package graft.sources

/** Run-outcome notification hook (reference: dags/utils/notifier.py:6-18
  * — a Lark group-chat message on DAG success/failure). The chat
  * transport is the same egress seam as [[LarkClient]]; the hook and
  * the success/failure wrapper are the portable part.
  */
trait IngestNotifier {
  def notify(message: String): Unit
}

/** Default sink: the JVM logger (stand-in for the chat API). */
object LogNotifier extends IngestNotifier {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  def notify(message: String): Unit = log.info(message)
}

object IngestNotifier {
  /** Run `body`, notifying success or failure like the reference's
    * on_success/on_failure callbacks (lark_to_gcs.py DAG args).
    *
    * Notification is best-effort: a throwing notifier must never turn
    * a successful run into a failure, nor replace the real failure
    * with its own (the chat API being down is not a data error). */
  def notifying[T](notifier: IngestNotifier, jobName: String)(body: => T): T = {
    def tell(msg: String): Unit =
      try notifier.notify(msg)
      catch { case scala.util.control.NonFatal(_) => }
    try {
      val r = body
      tell(s"[$jobName] succeeded")
      r
    } catch {
      case e: Throwable =>
        tell(s"[$jobName] FAILED: ${e.getMessage}")
        throw e
    }
  }
}
