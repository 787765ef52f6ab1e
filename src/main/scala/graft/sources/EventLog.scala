package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import types._

/**
 * One event in the log: opaque binary body + system metadata + free-form
 * string properties (ref data model: core/.../EventHubsSourceProvider.scala:152-165).
 * `enqueuedTimeMicros` is UTC microseconds (Spark's native timestamp unit).
 */
final case class Event(
    body: Array[Byte],
    enqueuedTimeMicros: Long,
    publisher: String = null,
    partitionKey: String = null,
    properties: Map[String, String] = Map.empty,
    systemProperties: Map[String, String] = Map.empty)

/**
 * Service-API seam between Spark planning/execution and a concrete event-log
 * backend (ref: core/.../Client.scala:29-92 — translate/bounds/receive/send/
 * partitionCount). Planning code only ever talks to this trait; the in-memory
 * simulator backs tests and local runs exactly as the reference's
 * SimulatedEventHubs does (SimulatedEventHubs.scala:30-258), while a remote
 * backend would implement the same trait with network calls.
 */
trait EventLogClient {
  def partitionCount(name: String): Int

  /** Per-partition (earliestSeqNo, latestSeqNo): earliest = first retained,
    * latest = next-to-be-assigned (exclusive end). */
  def boundedSeqNos(name: String): Map[PartitionId, (SequenceNumber, SequenceNumber)]

  /** Normalize any EventPosition to a concrete sequence number for one
    * partition (ref translate: EventHubsClient.scala:264-353). */
  def translate(name: String, pid: PartitionId, pos: EventPosition): SequenceNumber = {
    val (earliest, latest) = boundedSeqNos(name)(pid)
    pos match {
      case EventPosition.FromStartOfStream            => earliest
      case EventPosition.FromEndOfStream              => latest
      case EventPosition.FromSequenceNumber(n, incl)  => if (incl) n else n + 1
      case EventPosition.FromEnqueuedTime(t)          =>
        seekEnqueuedTime(name, pid, t.toEpochMilli * 1000L + t.getNano / 1000 % 1000)
      case EventPosition.FromOffset(types.StartOfStreamOffset, _) => earliest
      case EventPosition.FromOffset(types.EndOfStreamOffset, _)   => latest
      case EventPosition.FromOffset(o, incl) =>
        val s = seekOffset(name, pid, o)
        if (incl) s else s + 1
    }
  }

  /** Seek a non-sentinel byte-offset token to its sequence number (the
    * reference's third position kind, EventPosition.scala:31-56). The local
    * backends DEFINE an event's offset as its seqNo rendered as a string —
    * exactly what the source's `offset` column emits — so translation is a
    * parse; a remote backend with genuinely opaque offsets overrides this
    * with its metadata lookup. Fails loudly on a token this log never
    * issued rather than guessing a position. */
  def seekOffset(name: String, pid: PartitionId, offset: String): SequenceNumber = {
    // non-negative numerics only: a negative token other than the "-1"
    // sentinel (handled by the caller) was never issued by any log, and
    // letting it through as a negative seqNo would either clamp silently
    // (failOnDataLoss=false) or surface a misleading aged-out error
    val n = try offset.toLong
    catch { case _: NumberFormatException => -1L }
    if (n < 0) throw new IllegalArgumentException(
      s"offset '$offset' is not a position this event log issued " +
        s"(local offsets are non-negative numerics; sentinels: " +
        s"'${types.StartOfStreamOffset}' = start, " +
        s"'${types.EndOfStreamOffset}' = end)")
    n
  }

  /** First seqNo whose enqueuedTime >= the given UTC micros (latest if none). */
  def seekEnqueuedTime(name: String, pid: PartitionId, micros: Long): SequenceNumber

  /** Events [from, from+count) of one partition, paired with their seqNos. */
  def receive(name: String, pid: PartitionId, from: SequenceNumber, count: Long)
      : Iterator[(SequenceNumber, Event)]

  def send(name: String, event: Event, pid: Option[PartitionId], key: Option[String]): Unit
}

/**
 * In-memory partitioned append-only log, JVM-wide (executor threads in
 * local[*] share it; a multi-node deployment would replace this with a real
 * log service behind the same EventLogClient trait).
 *
 * Partition routing for unkeyed sends is round-robin; keyed sends hash the
 * key (ref: SimulatedEventHubs.scala:86-123).
 */
final class InMemoryEventLog(val name: String, val numPartitions: Int) {
  private val partitionLogs: Array[ArrayBuffer[Event]] =
    Array.fill(numPartitions)(ArrayBuffer.empty[Event])
  // first retained seqNo per partition (advanced by ageOut to simulate retention)
  private val earliest: Array[Long] = Array.fill(numPartitions)(0L)
  private val roundRobin = new java.util.concurrent.atomic.AtomicLong(0L)

  def partitionCount: Int = numPartitions

  def bounds: Map[PartitionId, (SequenceNumber, SequenceNumber)] = synchronized {
    (0 until numPartitions).map(p => p -> ((earliest(p), partitionLogs(p).length.toLong))).toMap
  }

  def append(pid: PartitionId, e: Event): SequenceNumber = synchronized {
    partitionLogs(pid) += e
    partitionLogs(pid).length - 1L
  }

  def route(e: Event, pid: Option[PartitionId], key: Option[String]): PartitionId =
    pid.getOrElse {
      key.map(k => math.floorMod(k.hashCode, numPartitions))
        .getOrElse(math.floorMod(roundRobin.getAndIncrement(), numPartitions.toLong).toInt)
    }

  def read(pid: PartitionId, from: SequenceNumber, count: Long): Iterator[(SequenceNumber, Event)] =
    synchronized {
      val log = partitionLogs(pid)
      // saturating add: from + count can overflow for "read everything" calls
      val until = if (count > log.length.toLong - from) log.length.toLong
        else from + count
      if (from >= until) Iterator.empty
      // materialize the slice under the lock; ranges are micro-batch sized
      else (from until until).map(i => i -> log(i.toInt)).toVector.iterator
    }

  def seek(pid: PartitionId, micros: Long): SequenceNumber = synchronized {
    val log = partitionLogs(pid)
    val i = log.indexWhere(_.enqueuedTimeMicros >= micros)
    if (i < 0) log.length.toLong else i.toLong
  }

  /** Simulate retention aging out events below `newEarliest` (for data-loss tests). */
  def ageOut(pid: PartitionId, newEarliest: SequenceNumber): Unit = synchronized {
    earliest(pid) = math.max(earliest(pid), newEarliest)
  }

  // ---- staged (transactional) writes ----
  // Write tasks stage their events here EXECUTOR-SIDE under a per-task key;
  // the sink's driver commit then atomically publishes the keys of the tasks
  // Spark reports successful and discards stale attempts. The commit message
  // carries only the key — never the data — so nothing is materialized on
  // the driver. A remote backend would implement the same two calls as a
  // transactional produce (or degrade to at-least-once task sends, which is
  // the reference's contract: EventHubsWriter.scala:41-70).

  private val staging =
    scala.collection.mutable.HashMap[String, ArrayBuffer[(Option[PartitionId], Option[String], Event)]]()

  // Epochs whose commit/abort already ran: a zombie or speculative task whose
  // stage lands AFTER the driver published its epoch must be dropped here,
  // or its buffer would sit under a prefix nobody sweeps again (unbounded
  // growth in long-running streams with speculation). LRU-capped — an epoch
  // old enough to be evicted cannot have in-flight tasks left.
  private val closedEpochs = new java.util.LinkedHashMap[String, java.lang.Boolean](16, 0.75f, false) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
      size > 4096
  }

  /** "queryId/epochId/" of a "queryId/epochId/partitionId/taskId" staging key. */
  private def epochPrefixOf(key: String): String = {
    val i = key.indexOf('/')
    val j = if (i < 0) -1 else key.indexOf('/', i + 1)
    if (j < 0) key else key.substring(0, j + 1)
  }

  def stageAll(key: String, events: Iterable[(Option[PartitionId], Option[String], Event)])
      : Unit = synchronized {
    if (!closedEpochs.containsKey(epochPrefixOf(key)))
      staging.getOrElseUpdate(key, ArrayBuffer.empty) ++= events
  }

  def discardStaged(key: String): Unit = synchronized { staging.remove(key); () }

  /** Discard every staged attempt of an epoch WITHOUT closing it — the
    * ABORT path. An aborted epoch legitimately re-runs after a restart
    * under the SAME (queryId, epochId), so marking it closed here would
    * make stageAll silently drop the retry's rows and wedge the query
    * permanently on "staging was lost before commit". A zombie stage
    * landing after this sweep parks until the epoch's retry publishes
    * (publishStaged sweeps the prefix) — bounded by one attempt's rows if
    * the query never returns. Only publishStaged closes an epoch. */
  def sweepStaged(prefix: String): Unit = synchronized {
    staging.keys.filter(_.startsWith(prefix)).toList.foreach(staging.remove)
  }

  /** Atomically append the staged buffers under `keys` (caller passes them in
    * deterministic task order), then drop every other staged attempt of the
    * same epoch (`prefix`) — failed/speculative duplicates. Returns rows
    * published. */
  def publishStaged(prefix: String, keys: Seq[String]): Long = synchronized {
    var n = 0L
    keys.foreach { k =>
      staging.remove(k).foreach { buf =>
        buf.foreach { case (pid, pkey, e) => append(route(e, pid, pkey), e) }
        n += buf.length
      }
    }
    staging.keys.filter(_.startsWith(prefix)).toList.foreach(staging.remove)
    closedEpochs.put(prefix, java.lang.Boolean.TRUE)
    n
  }

  /** Staged-but-unpublished row count (tests/diagnostics). */
  def stagedCount(prefix: String = ""): Long = synchronized {
    staging.collect { case (k, v) if k.startsWith(prefix) => v.length.toLong }.sum
  }
}

/**
 * JVM-wide registry of named in-memory logs + the EventLogClient for them.
 * Named logs back sinks, roundtrips, and tests; parquet-`path` logs are NOT
 * held here — they are read executor-side by ParquetEventLog (no driver-held
 * copy of the data; see EventLogClients.forConf).
 */
object EventLogRegistry extends EventLogClient {
  private val logs = new ConcurrentHashMap[String, InMemoryEventLog]()
  private val growthLock = new Object

  def create(name: String, partitions: Int): InMemoryEventLog =
    logs.computeIfAbsent(name, _ => new InMemoryEventLog(name, partitions))

  def get(name: String): InMemoryEventLog = {
    val l = logs.get(name)
    if (l == null) throw new IllegalArgumentException(s"unknown event log '$name'")
    l
  }

  def exists(name: String): Boolean = logs.containsKey(name)
  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    logs.keySet().asScala.toSeq.sorted
  }
  def drop(name: String): Unit = logs.remove(name)
  def reset(): Unit = logs.clear()

  /** Grow a log's partition count (simulates dynamic partition discovery,
    * ref R5: EventHubsClient.scala:171-209). Copies existing data. */
  def grow(name: String, newPartitions: Int): InMemoryEventLog = growthLock.synchronized {
    val old = get(name)
    require(newPartitions > old.numPartitions)
    val bigger = new InMemoryEventLog(name, newPartitions)
    for (p <- 0 until old.numPartitions; (_, e) <- old.read(p, 0L, Long.MaxValue))
      bigger.append(p, e)
    logs.put(name, bigger)
    bigger
  }

  /** Ensure a NAMED log exists for `conf` (sinks auto-create their target,
    * like the reference's hub-must-exist-at-send contract relaxed for local
    * use). Parquet-`path` confs never come through here — they are read-only
    * and served by ParquetEventLog. */
  def ensure(conf: EventLogConf): InMemoryEventLog = {
    require(conf.path.isEmpty,
      s"parquet-backed event log '${conf.name}' has no registry entry (read-only)")
    create(conf.name, conf.partitions)
  }

  // ---- EventLogClient over the registry ----
  override def partitionCount(name: String): Int = get(name).partitionCount
  override def boundedSeqNos(name: String): Map[PartitionId, (SequenceNumber, SequenceNumber)] =
    get(name).bounds
  override def seekEnqueuedTime(name: String, pid: PartitionId, micros: Long): SequenceNumber =
    get(name).seek(pid, micros)
  override def receive(name: String, pid: PartitionId, from: SequenceNumber, count: Long)
      : Iterator[(SequenceNumber, Event)] = get(name).read(pid, from, count)
  override def send(name: String, event: Event, pid: Option[PartitionId], key: Option[String])
      : Unit = {
    val log = get(name)
    log.append(log.route(event, pid, key), event)
  }
}
