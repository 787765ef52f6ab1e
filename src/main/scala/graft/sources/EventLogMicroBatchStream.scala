package graft.sources

import org.apache.spark.internal.Logging
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types.StructType

import types._

/**
 * Streaming source offset: per-partition next-seqNo map, JSON-serialized into
 * Spark's checkpoint offset log (ref: core/.../EventHubsSourceOffset.scala:26-45,
 * JsonUtils.scala:63-100). Format: {"name":{"0":5,"1":5}}.
 */
final case class EventLogSourceOffset(name: String, seqNos: Map[PartitionId, SequenceNumber])
    extends Offset {
  override def json(): String = MiniJson.renderPartitionSeqNos(name, seqNos)
}

object EventLogSourceOffset {
  def parse(json: String): EventLogSourceOffset = {
    val m = MiniJson.parsePartitionSeqNos(json)
    require(m.nonEmpty, s"empty offset json: $json")
    val name = m.head._1.name
    EventLogSourceOffset(name, m.map { case (np, s) => np.partitionId -> s })
  }
}

/**
 * Micro-batch streaming source over the event log (re-architecture of the
 * reference's v1 `EventHubsSource`, core/.../EventHubsSource.scala:91-420,
 * onto DSv2 `MicroBatchStream` + `SupportsAdmissionControl`):
 *
 *  - `initialOffset`: translate the configured starting position per
 *    partition (Spark persists it; no custom HDFSMetadataLog needed).
 *  - `latestOffset(start, limit)`: admission control — proportional proration
 *    of maxEventsPerTrigger across partitions by backlog (ref R1), after
 *    clamping aged-out starts (ref R4) and discovering new partitions
 *    (ref R5: partition-count growth merges in at earliest).
 *  - `planInputPartitions(start, end)`: one OffsetRange per partition with
 *    stable executor placement (ref S6).
 *
 * Exactly-once source semantics come from deterministic [from, until) ranges
 * per committed batch, identical to the reference's contract (SURVEY §2.4).
 */
class EventLogMicroBatchStream(conf: EventLogConf, schema: StructType)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow with ReportsSourceMetrics with Logging {

  private val client: EventLogClient = EventLogClients.forConf(conf)
  EventLogClients.validateForRead(conf)
  private val name = conf.name

  // Executor -> driver transport for slow-partition receive metrics (ref
  // R3's PartitionPerformanceReceiver RPC, re-expressed as a Spark
  // accumulator — the non-private-API channel): readers add one
  // ReceiveSample per (partition, batch); task completion delivers them
  // here, and latestOffset()/metrics() drain them into the tracker. In
  // local mode the readers ALSO feed the tracker directly (shared JVM);
  // delivery is deduplicated per (partition, batch) by the tracker.
  private val receiveAcc
      : Option[org.apache.spark.util.CollectionAccumulator[ReceiveSample]] =
    if (!conf.slowPartitionAdjustment) None
    else org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.collectionAccumulator[ReceiveSample](
        s"graft.receive.${conf.throttlerKey}"))

  /** Fold accumulated receive samples into the driver tracker, then clear
    * the accumulator (samples landing during the tiny read-to-reset window
    * are lost — acceptable for an advisory throttle signal, and the next
    * batch's samples re-measure the same partitions). */
  private def drainReceiveMetrics(): Unit = receiveAcc.foreach { acc =>
    import scala.jdk.CollectionConverters._
    val snapshot = acc.value.asScala.toList
    if (snapshot.nonEmpty) {
      acc.reset()
      val t = PartitionThrottler.forLog(
        conf.throttlerKey, conf.maxAcceptableBatchReceiveTimeMs)
      snapshot.foreach(s => t.record(s.batchId, s.pid, s.events, s.elapsedNanos))
    }
  }

  // Trigger.AvailableNow: snapshot the end offsets once; rate-limited
  // micro-batches then run until the snapshot is reached (without this,
  // Spark falls back to one unbounded batch and admission control is
  // silently bypassed).
  @volatile private var availableNowEnd: Option[Map[PartitionId, SequenceNumber]] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowEnd = Some(
      client.boundedSeqNos(name).map { case (p, (_, latest)) => p -> latest })
  }

  private def defaultBudget: Long =
    conf.maxEventsPerTrigger.getOrElse(client.partitionCount(name) * DefaultMaxEventsPerTrigger)

  // the documented default cap is partitionCount * 1000 (ref
  // EventHubsSource.scala:91-96) — NOT unbounded; allAvailable would read
  // the whole backlog in one micro-batch
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(conf.maxEventsPerTrigger.getOrElse(
      client.partitionCount(name) * DefaultMaxEventsPerTrigger))

  override def initialOffset(): Offset = {
    val seqNos = client.boundedSeqNos(name).map { case (pid, _) =>
      pid -> client.translate(name, pid, conf.startingPositionFor(pid))
    }
    EventLogSourceOffset(name, seqNos)
  }

  override def deserializeOffset(json: String): Offset = EventLogSourceOffset.parse(json)

  override def reportLatestOffset(): Offset =
    EventLogSourceOffset(name, client.boundedSeqNos(name).map { case (p, (_, latest)) => p -> latest })

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startSeqNos = start.asInstanceOf[EventLogSourceOffset].seqNos
    val bounds = client.boundedSeqNos(name)
    // Partition growth: partitions unseen in `start` begin at earliest
    // (ref: EventHubsSource.scala:183-192,350-366).
    val merged: Map[PartitionId, (SequenceNumber, SequenceNumber)] =
      bounds.map { case (pid, (earliest, latest0)) =>
        val from0 = startSeqNos.getOrElse(pid, earliest)
        // Data-loss clamp (ref R4: EventHubsSource.adjustStartingOffset).
        val from = if (from0 < earliest) {
          if (conf.failOnDataLoss) throw new IllegalStateException(
            s"start seqNo $from0 for $name-$pid aged out (earliest $earliest)")
          logWarning(s"$name-$pid: events [$from0,$earliest) aged out; advancing to earliest")
          earliest
        } else from0
        // AvailableNow: never read past the prepared snapshot
        val latest = availableNowEnd.flatMap(_.get(pid))
          .fold(latest0)(math.min(_, latest0))
        pid -> ((from, math.max(from, latest)))
      }
    // Adaptive throttling: shrink slow partitions' share (ref R3).
    val factor: PartitionId => Double =
      if (conf.slowPartitionAdjustment) {
        drainReceiveMetrics() // pull executor-side samples before deciding
        val f = PartitionThrottler.forLog(conf.throttlerKey, conf.maxAcceptableBatchReceiveTimeMs).factors
        conf.throttlingStatusPlugin.foreach(p =>
          p.onPartitionsStatusUpdate(merged.keys.map(k => k -> f(k)).toMap))
        f
      } else _ => 1.0
    val maxRates = conf.maxRatesPerPartition
    val untils: Map[PartitionId, SequenceNumber] = limit match {
      // allAvailable (Trigger.Once) must drain in one batch, so per-partition
      // caps are ignored there — same convention as Kafka's maxOffsetsPerTrigger
      case _: ReadAllAvailable => merged.map { case (p, (_, latest)) => p -> latest }
      case r: ReadMaxRows      => RateLimiter.prorate(merged, r.maxRows(), factor, maxRates)
      case _                   => RateLimiter.prorate(merged, defaultBudget, factor, maxRates)
    }
    conf.throttlingStatusPlugin.foreach(_.onBatchCreation(-1L, untils))
    EventLogSourceOffset(name, untils)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val startMap = start.asInstanceOf[EventLogSourceOffset].seqNos
    val endMap = end.asInstanceOf[EventLogSourceOffset].seqNos
    val bounds = client.boundedSeqNos(name)
    val executors = sortedExecutors()
    // planning-only options never serialize into tasks (EventHubsConf.trimmed)
    val shipped = conf.executorTrimmed.options
    endMap.toArray.sortBy(_._1).map { case (pid, until) =>
      val earliest = bounds.get(pid).map(_._1).getOrElse(0L)
      var from = startMap.getOrElse(pid, earliest)
      if (from < earliest) {
        if (conf.failOnDataLoss) throw new IllegalStateException(
          s"batch start $from for $name-$pid aged out (earliest $earliest)")
        from = earliest
      }
      val np = NameAndPartition(name, pid)
      val loc = PlacementStrategy.locate(conf.placementStrategy, np, executors)
      EventLogInputPartition(
        shipped,
        // shrink inverted ranges to empty instead of failing (ref R4)
        OffsetRange(np, from, math.max(from, until), loc)): InputPartition
    }
  }

  /** Sorted executor list for stable placement (ref:
    * EventHubsSource.getSortedExecutorList, EventHubsSource.scala:468-484). */
  private def sortedExecutors(): IndexedSeq[String] =
    org.apache.spark.graft.ExecutorDiscovery.sortedExecutors()

  override def createReaderFactory(): PartitionReaderFactory =
    new EventLogReaderFactory(schema, receiveAcc)

  /**
   * Per-source observability in `StreamingQueryProgress.sources[].metrics`
   * (ref: the reference's input-metrics behavior,
   * EventHubsSourceSuite.scala:657-693, and its throttle state exposed via
   * plugins): events-behind-latest min/avg/max (the Kafka-source metric
   * shape, derivable driver-side from offsets — no executor round-trip) and,
   * when adaptive throttling is on, the per-partition throttle factors.
   * Metrics must never fail a healthy query, so errors degrade to empty.
   */
  override def metrics(latestConsumedOffset: java.util.Optional[Offset])
      : java.util.Map[String, String] = {
    val out = new java.util.HashMap[String, String]()
    try {
      if (latestConsumedOffset.isPresent) {
        val consumed = latestConsumedOffset.get() match {
          case o: EventLogSourceOffset => o.seqNos
          case o                       => EventLogSourceOffset.parse(o.json()).seqNos
        }
        val bounds = client.boundedSeqNos(name)
        val behind = bounds.toSeq.map { case (pid, (earliest, latest)) =>
          // a partition absent from the consumed offset (discovered AFTER
          // that offset was committed) is entirely unread: its lag is the
          // full retained backlog, not zero
          math.max(0L, latest - consumed.getOrElse(pid, earliest))
        }
        if (behind.nonEmpty) {
          out.put("minEventsBehindLatest", behind.min.toString)
          out.put("maxEventsBehindLatest", behind.max.toString)
          out.put("avgEventsBehindLatest", (behind.sum.toDouble / behind.size).toString)
        }
      }
      if (conf.slowPartitionAdjustment) {
        drainReceiveMetrics()
        val f = PartitionThrottler.forLog(conf.throttlerKey, conf.maxAcceptableBatchReceiveTimeMs).factors
        val rendered = (0 until client.partitionCount(name))
          .map(p => s""""$p":${f(p)}""").mkString("{", ",", "}")
        out.put("throttleFactors", rendered)
      }
      // recall-loss counters from the operator layer's skew guards (already
      // computed and cached — no job here): a streaming pipeline's hot-key
      // drops surface in the SQL UI next to the source's own metrics instead
      // of only in executor logs / the pull API. With `dropMetricsScope`
      // set (and the pipeline's operators built under the matching
      // Dedup.withDropScope label) only THIS query's counters publish;
      // unset keeps the legacy process-wide view, where every graft source
      // in the JVM reports every pipeline's tags.
      val drops = conf.dropMetricsScope match {
        case Some(scope) => graft.operators.Dedup.scopedDropStats(scope)
        case None        => graft.operators.Dedup.publishedDropStats
      }
      drops.foreach { case (tag, s) =>
        out.put(s"drops.$tag.buckets", s.buckets.toString)
        out.put(s"drops.$tag.rows", s.rows.toString)
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"source metrics for $name unavailable: $e")
    }
    out
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
