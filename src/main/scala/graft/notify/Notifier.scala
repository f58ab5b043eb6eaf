package graft.notify

/** Failure/alert notification channel — the reference posts a Google
  * Chat card on ingest failure and SLA cancellation
  * (modules/send_google_chat.py:79-87, notebooks/Run jobs.py:180-202).
  * The rebuild keeps the channel pluggable: the engine calls
  * [[Notifier.notify]] at the same points; deployments provide a
  * webhook-backed impl, tests and local runs use [[LogNotifier]] /
  * [[BufferingNotifier]].
  */
trait Notifier {
  /** @param event   short machine-readable kind, e.g. "CORRUPT_BATCH",
    *                "SLA_CANCEL", "RUN_FAILED"
    * @param subject the feed/table/job the event concerns
    * @param message human-readable detail */
  def notify(event: String, subject: String, message: String): Unit
}

/** Default channel: the JVM log. */
final class LogNotifier extends Notifier {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[LogNotifier])
  override def notify(event: String, subject: String, message: String): Unit =
    log.warn(s"[notify:$event] $subject — $message")
}

/** Test channel: notifications captured in memory. */
final class BufferingNotifier extends Notifier {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
  override def notify(event: String, subject: String, message: String): Unit =
    buf.synchronized { buf += ((event, subject, message)): Unit }
  def events: Seq[(String, String, String)] = buf.synchronized(buf.toSeq)
}

object Notifier {
  val default: Notifier = new LogNotifier
}
