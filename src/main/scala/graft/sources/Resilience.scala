package graft.sources

import types._

/**
 * Backend resilience for the EventLogClient seam.
 *
 * The reference retries transient service faults a bounded number of times
 * with a fixed delay and rethrows everything else immediately
 * (core/.../utils/RetryUtils.scala:36-173 — only exceptions flagged
 * transient retry, checked both directly and through getCause;
 * RetryCount=10 at package.scala:57, 10 ms default delay), and bounds
 * individual receives and whole operations with receiverTimeout /
 * operationTimeout (package.scala:39-47, defaults 60 s / 300 s).
 *
 * Our client calls are synchronous (no future plumbing is needed
 * in-process), so the same policy is a plain bounded loop: retry only
 * failures marked [[TransientLogFailure]] (directly or as a cause), sleep
 * `retryDelayMs` between attempts, give up when `maxRetries` attempts or
 * the `operationTimeout` budget are exhausted. `receiverTimeout` bounds a
 * single receive ATTEMPT: an attempt that fails after exceeding it is not
 * retried further (the backend is timing out, not blipping), while an
 * attempt that SUCCEEDS over the bound returns its data with a warning —
 * a synchronous call cannot be interrupted, and discarding successfully
 * fetched rows only to re-fetch them would turn a slow-but-healthy backend
 * into a failing one.
 *
 * Iterator consumption AFTER a successful receive call is deliberately not
 * retried here: mid-scan failures belong to Spark's own task-retry layer,
 * which re-runs the partition read from its checkpointed offsets — wrapping
 * a lazy 100 TB scan in a client-side replay buffer would trade a clean
 * task retry for unbounded memory.
 */
trait TransientLogFailure { self: Throwable => }

/** A backend fault that may succeed on retry (connection blip, throttling,
  * leadership change — the reference's `EventHubException.getIsTransient`). */
final class TransientLogException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause) with TransientLogFailure

/** Retry/timeout policy, lifted from an [[EventLogConf]]. */
final case class RetryPolicy(
    maxRetries: Int,
    retryDelayMs: Long,
    receiverTimeoutMs: Long,
    operationTimeoutMs: Long)

/**
 * Decorator adding the bounded-retry policy to any [[EventLogClient]].
 * Planning (driver) and partition readers (executors) both resolve clients
 * through [[EventLogClients.forConf]], so both sides of a query get the
 * same fault handling.
 */
final class RetryingClient(underlying: EventLogClient, policy: RetryPolicy)
    extends EventLogClient with org.apache.spark.internal.Logging {

  private def isTransient(t: Throwable): Boolean = t match {
    case _: TransientLogFailure => true
    case _ => t.getCause != null && t.getCause.isInstanceOf[TransientLogFailure]
  }

  /** Run `fn` under the retry policy. `timed` marks receive-shaped calls:
    * a FAILED attempt that also overran receiverTimeout stops retrying (a
    * timing-out backend won't be saved by hammering it), and a successful
    * attempt over the bound is returned with a warning, never discarded. */
  private def retry[T](op: String, timed: Boolean = false)(fn: => T): T = {
    val deadline = System.nanoTime() + policy.operationTimeoutMs * 1000000L
    var attempt = 0
    while (true) {
      val t0 = System.nanoTime()
      def tookMs: Long = (System.nanoTime() - t0) / 1000000L
      try {
        val out = fn
        if (timed && tookMs > policy.receiverTimeoutMs)
          logWarning(s"$op took $tookMs ms, over receiverTimeout " +
            s"${policy.receiverTimeoutMs} ms (returning the fetched data; " +
            "raise receiverTimeout or reduce the trigger budget)")
        return out
      } catch {
        case t: Throwable if isTransient(t) =>
          if (timed && tookMs > policy.receiverTimeoutMs)
            throw new java.util.concurrent.TimeoutException(
              s"$op failed after exceeding receiverTimeout " +
                s"${policy.receiverTimeoutMs} ms (${t.getMessage})")
          attempt += 1
          if (attempt > policy.maxRetries)
            throw new java.io.IOException(
              s"$op failed after ${policy.maxRetries} retries", t)
          if (System.nanoTime() + policy.retryDelayMs * 1000000L > deadline)
            throw new java.util.concurrent.TimeoutException(
              s"$op exhausted operationTimeout ${policy.operationTimeoutMs} ms " +
                s"after $attempt transient failures (last: ${t.getMessage})")
          Thread.sleep(policy.retryDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def partitionCount(name: String): Int =
    retry(s"partitionCount($name)")(underlying.partitionCount(name))

  override def boundedSeqNos(name: String): Map[PartitionId, (SequenceNumber, SequenceNumber)] =
    retry(s"boundedSeqNos($name)")(underlying.boundedSeqNos(name))

  override def seekEnqueuedTime(name: String, pid: PartitionId, micros: Long): SequenceNumber =
    retry(s"seekEnqueuedTime($name, $pid)")(underlying.seekEnqueuedTime(name, pid, micros))

  override def receive(name: String, pid: PartitionId, from: SequenceNumber, count: Long)
      : Iterator[(SequenceNumber, Event)] =
    retry(s"receive($name, $pid, $from, n=$count)", timed = true)(
      underlying.receive(name, pid, from, count))

  override def send(name: String, event: Event, pid: Option[PartitionId], key: Option[String])
      : Unit =
    retry(s"send($name)")(underlying.send(name, event, pid, key))
}
