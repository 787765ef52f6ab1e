package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    }
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
}

/**
 * JVM-wide registry of named in-memory logs + the default EventLogClient.
 * Parquet-seeded logs are created lazily and exactly once per (path,
 * partitions): the `events` table is mapped deterministically
 *   partition        = event_id mod partitions
 *   sequenceNumber   = rank of event_id within its partition (0-based)
 *   enqueuedTime     = ts
 *   body             = UTF-8 bytes of props
 *   properties       = {"event_type": event_type}
 * so results are reproducible and expressible as oracle SQL.
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

  /** Ensure a log exists for `conf`, seeding from parquet when `path` is set.
    * Runs a (driver-side) Spark job on first use of a given path; the loaded
    * log is cached JVM-wide, so repeated queries and micro-batches reuse it —
    * the local analog of the reference's executor-cached receivers (C3). */
  def ensure(conf: EventLogConf): InMemoryEventLog = {
    val n = conf.name
    val existing = logs.get(n)
    if (existing != null) existing
    else conf.path match {
      case Some(p) => seedFromParquet(p, conf.partitions)
      case None    => create(n, conf.partitions)
    }
  }

  /** Like ensure, but reading an unknown named log is an error rather than a
    * silent empty result (a missing hub on the read path means a typo'd name). */
  def ensureForRead(conf: EventLogConf): InMemoryEventLog = {
    if (conf.path.isEmpty && !exists(conf.name))
      throw new IllegalArgumentException(
        s"unknown event log '${conf.name}' — create it first or pass a 'path' to seed from")
    ensure(conf)
  }

  private def seedFromParquet(path: String, partitions: Int): InMemoryEventLog = {
    val name = EventLogConf.parquetLogName(path, partitions)
    logs.computeIfAbsent(name, _ => {
      val spark = SparkSession.active
      val log = new InMemoryEventLog(name, partitions)
      // the driver testdata writes TIMESTAMP(NANOS), which Spark only reads
      // as a long when this legacy flag is on
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path)
      val tsMicros = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000") // nanos -> micros
        case _                                   => unix_micros(col("ts"))
      }
      // Deterministic layout; sort by event_id then append in partition order.
      val rows = raw
        .select(
          pmod(col("event_id"), lit(partitions)).cast("int").as("pid"),
          col("event_id"),
          tsMicros.as("ts_us"),
          col("props"),
          col("event_type"))
        .orderBy("pid", "event_id")
        .collect()
      rows.foreach { r =>
        val e = Event(
          body = r.getAs[String]("props").getBytes("UTF-8"),
          enqueuedTimeMicros = r.getAs[Long]("ts_us"),
          properties = Map("event_type" -> r.getAs[String]("event_type")))
        log.append(r.getAs[Int]("pid"), e)
      }
      log
    })
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
