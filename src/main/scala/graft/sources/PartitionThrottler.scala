package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import types._

/**
 * Slow-partition adaptive throttling (re-architecture of the reference's
 * PartitionsStatusTracker + PartitionPerformanceReceiver,
 * core/.../PartitionsStatusTracker.scala:150-415,
 * PartitionPerformanceReceiver.scala:27-71; design doc
 * docs/slow-partition-adjustment-feature.md):
 *
 * Executors report per-(batch, partition) receive metrics; the driver keeps a
 * sliding window of recent batches and computes a per-partition performance
 * factor in [0,1]:
 *   - time-per-event t_p = elapsed / events for each partition
 *   - a partition is SLOW iff t_p > mean + stddevMultiplier * stddev
 *     (ref rule: PartitionsStatusTracker.scala:399-406) AND its batch
 *     receive time exceeds `maxAcceptableBatchMs` (ref qualification gate:
 *     maxAcceptableBatchReceiveTime, EventHubsConf.scala:530-546, default
 *     30 s at package.scala:43 — partitions finishing their share quickly
 *     are never throttled no matter how the distribution leans)
 *   - factor = mean / t_p for slow partitions, 1.0 otherwise
 * The factor multiplies the partition's prorated share in the next batch's
 * admission control (RateLimiter.prorate(throttleFactor)).
 *
 * Metrics transport: TWO paths feed the same tracker. In local mode the
 * reader and driver share a JVM, so the reader's direct `record` call
 * lands in the driver registry (the exact analog of the reference's
 * simulated tracker used by its own tests). On a multi-node cluster that
 * call lands in the executor's own JVM and would be invisible — so the
 * streaming source ALSO ships a [[ReceiveSample]] accumulator to every
 * reader (the SURVEY-suggested non-private-API stand-in for the
 * reference's RpcEndpoint, PartitionPerformanceReceiver.scala:27-71):
 * task completion carries the samples to the driver, which drains them
 * into the tracker before each admission decision. Double delivery in
 * local mode is harmless — `record` replaces same-(partition, batch)
 * samples instead of appending. The tracker math is transport-agnostic.
 */
/** One reader task's receive measurement, carried executor -> driver by a
  * CollectionAccumulator on task completion (Spark's own metrics channel —
  * no private APIs, no extra RPC). `batchId` is the range-start surrogate
  * the readers already use: unique per (partition, micro-batch) for a
  * progressing stream. */
final case class ReceiveSample(
    batchId: Long, pid: PartitionId, events: Long, elapsedNanos: Long)

final class PartitionThrottler(
    val windowSize: Int = 3,
    val stddevMultiplier: Double = 1.0,
    val minEventsForMeasure: Long = 10L,
    val maxAcceptableBatchMs: Long = 30000L) {

  private case class Sample(batchId: Long, events: Long, elapsedNanos: Long)
  private val samples = new ConcurrentHashMap[PartitionId, List[Sample]]()

  /** Record one partition's receive metrics for a batch (executor-side call). */
  def record(batchId: Long, pid: PartitionId, events: Long, elapsedNanos: Long): Unit = {
    if (events >= minEventsForMeasure) {
      samples.compute(pid, (_, old) => {
        val prev = if (old == null) Nil else old
        (Sample(batchId, events, elapsedNanos) :: prev.filter(_.batchId != batchId))
          .sortBy(-_.batchId).take(windowSize)
      })
    }
  }

  /** Per-partition average time-per-event (nanos) over the sliding window. */
  def timePerEvent: Map[PartitionId, Double] =
    samples.asScala.toMap.collect {
      case (pid, ss) if ss.nonEmpty =>
        pid -> ss.map(s => s.elapsedNanos.toDouble / s.events).sum / ss.size
    }

  /**
   * Throttle factors: 1.0 for healthy partitions; mean/t for slow ones.
   * With fewer than two measured partitions there is no distribution to
   * compare against — everything is 1.0 (matches the reference's behavior of
   * defaulting performance percentages to 1).
   */
  def factors: PartitionId => Double = {
    val t = timePerEvent
    if (t.size < 2) _ => 1.0
    else {
      val mean = t.values.sum / t.size
      val variance = t.values.map(v => (v - mean) * (v - mean)).sum / t.size
      val stddev = math.sqrt(variance)
      val cutoff = mean + stddevMultiplier * stddev
      // acceptance gate: avg batch receive time within the window must
      // exceed maxAcceptableBatchMs before a partition qualifies as slow
      val acceptableNanos = maxAcceptableBatchMs * 1000000.0
      val avgElapsed: Map[PartitionId, Double] = samples.asScala.toMap.collect {
        case (pid, ss) if ss.nonEmpty =>
          pid -> ss.map(_.elapsedNanos.toDouble).sum / ss.size
      }
      val f = t.map { case (pid, v) =>
        val overGate = avgElapsed.getOrElse(pid, 0.0) > acceptableNanos
        pid -> (if (v > cutoff && v > 0 && overGate)
          math.max(0.0, math.min(1.0, mean / v)) else 1.0)
      }
      pid => f.getOrElse(pid, 1.0)
    }
  }

  def reset(): Unit = samples.clear()
}

/** JVM-wide registry of throttlers keyed by log name (driver-side state). */
object PartitionThrottler {
  private val trackers = new ConcurrentHashMap[String, PartitionThrottler]()
  /** First resolution of a key decides its tuning (driver planning runs
    * before any executor record() in a micro-batch, so the conf-supplied
    * threshold wins for conf-driven streams). */
  def forLog(name: String, maxAcceptableBatchMs: Long = 30000L): PartitionThrottler =
    trackers.computeIfAbsent(name,
      _ => new PartitionThrottler(maxAcceptableBatchMs = maxAcceptableBatchMs))
  def drop(name: String): Unit = trackers.remove(name)
}

/**
 * Observability SPIs (ref C6: MetricPlugin.scala:22-36,
 * ThrottlingStatusPlugin.scala:26-39). Wire an implementation class name via
 * the `metricPlugin` / `throttlingStatusPlugin` options.
 */
trait MetricPlugin extends Serializable {
  def onReceiveMetric(np: NameAndPartition, batchId: Long, events: Long,
      elapsedNanos: Long): Unit
}

trait ThrottlingStatusPlugin extends Serializable {
  def onBatchCreation(batchId: Long,
      untilSeqNos: Map[PartitionId, SequenceNumber]): Unit
  def onPartitionsStatusUpdate(factors: Map[PartitionId, Double]): Unit
}

/** Default log-only implementations (ref SimpleLogMetricPlugin /
  * SimpleThrottlingStatusPlugin). */
class SimpleLogMetricPlugin extends MetricPlugin with org.apache.spark.internal.Logging {
  override def onReceiveMetric(np: NameAndPartition, batchId: Long, events: Long,
      elapsedNanos: Long): Unit =
    logInfo(s"receive $np batch=$batchId events=$events elapsedMs=${elapsedNanos / 1e6}")
}

class SimpleThrottlingStatusPlugin extends ThrottlingStatusPlugin
    with org.apache.spark.internal.Logging {
  override def onBatchCreation(batchId: Long,
      untilSeqNos: Map[PartitionId, SequenceNumber]): Unit =
    logInfo(s"batch $batchId planned untils=$untilSeqNos")
  override def onPartitionsStatusUpdate(factors: Map[PartitionId, Double]): Unit =
    logInfo(s"throttle factors=$factors")
}
