package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import types._

/**
 * DataSource V2 provider for the graft event log:
 * `spark.read/readStream.format("graft-eventlog")`.
 *
 * Re-architects the reference's v1 `StreamSourceProvider`/`BaseRelation`
 * surface (ref: core/.../EventHubsSourceProvider.scala:60-141) onto Spark 4
 * DSv2: Table + ScanBuilder + Batch/MicroBatchStream + WriteBuilder. The
 * fixed 9-column row schema is identical to the reference
 * (EventHubsSourceProvider.scala:152-165) and deliberately NOT
 * user-configurable — payload decoding belongs to downstream Spark SQL.
 */
class EventLogTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-eventlog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventLogTable.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventLogTable(EventLogConf(new CaseInsensitiveStringMap(properties)))

  override def supportsExternalMetadata(): Boolean = false
}

object EventLogTable {
  /** Fixed source schema (ref: EventHubsSourceProvider.scala:152-165). */
  val schema: StructType = StructType(Seq(
    StructField("body", BinaryType),
    StructField("partition", StringType),
    StructField("offset", StringType),
    StructField("sequenceNumber", LongType),
    StructField("enqueuedTime", TimestampType),
    StructField("publisher", StringType),
    StructField("partitionKey", StringType),
    StructField("properties", MapType(StringType, StringType), nullable = true),
    StructField("systemProperties", MapType(StringType, StringType), nullable = true)))

  /** Crude per-event in-memory cost used for reported statistics. */
  val EstBytesPerEvent: Long = 96L
}

/** DSv2 custom metrics (SQL-UI visible; task values are summed). */
final class EventsServedMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "eventsServed"
  override def description(): String = "events served by event-log partition readers"
}
final class StagedRowsMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "stagedRows"
  override def description(): String = "rows staged executor-side awaiting epoch publish"
}
final class LongTaskMetric(n: String, v: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = n
  override def value(): Long = v
}

class EventLogTable(val conf: EventLogConf) extends Table
    with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.read.streaming.ReportsSinkMetrics {
  conf.validated() // reject typo'd options loudly, at table resolution time

  override def name(): String = s"graft-eventlog(${conf.name})"

  /** Sink-side `StreamingQueryProgress.sink.metrics`: rows still staged for
    * this log (0 after a healthy epoch publish) and the log's appended total.
    * Parquet-backed logs are read-only — no sink state to report. */
  override def metrics(): java.util.Map[String, String] = {
    val out = new java.util.HashMap[String, String]()
    if (conf.path.isEmpty && EventLogRegistry.exists(conf.name)) {
      val log = EventLogRegistry.get(conf.name)
      out.put("stagedRows", log.stagedCount().toString)
      out.put("appendedEvents",
        log.bounds.values.map { case (earliest, latest) => latest - earliest }.sum.toString)
    }
    out
  }
  override def schema(): StructType = EventLogTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  // per-scan/write options override the table's own (catalog-loaded tables
  // arrive with empty options; format() reads carry everything here)
  private def merged(options: CaseInsensitiveStringMap): EventLogConf =
    EventLogConf(conf.options ++ EventLogConf(options).options).validated()

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventLogScanBuilder(merged(options))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new EventLogWriteBuilder(merged(info.options()), info.schema(), info.queryId())
}

/**
 * ScanBuilder with column pruning, seqNo/enqueuedTime range pushdown and
 * limit pushdown.
 *
 * The reference achieves range pruning by translating start/end positions
 * before the scan (ref P2: EventHubsClient.scala:264-353); we additionally
 * let Catalyst-pushed `sequenceNumber`/`enqueuedTime` predicates narrow the
 * per-partition ranges (`SupportsPushDownFilters`), and `LIMIT n` clamp each
 * partition's range (`SupportsPushDownLimit` — the DSv2 analog of the
 * reference's metadata-only `take`, ref S5: EventHubsRDD.scala:59-89).
 * Pushed filters are still re-evaluated by Spark above the scan (they are
 * reported as residuals), so pushdown is a pure pruning optimization and can
 * never change results.
 */
class EventLogScanBuilder(conf: EventLogConf) extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var prunedSchema: StructType = EventLogTable.schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var sawFilters = false
  private var pushedAgg: Option[(Boolean, Seq[Int])] = None // (groupByPartition, AggKind ordinals)

  // range narrowing extracted from pushed predicates (applied per partition)
  private var minSeqNo: Option[Long] = None     // inclusive
  private var maxSeqNoEx: Option[Long] = None   // exclusive
  private var minTimeUs: Option[Long] = None    // inclusive

  override def pruneColumns(requiredSchema: StructType): Unit =
    prunedSchema = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    import org.apache.spark.sql.sources._
    sawFilters = filters.nonEmpty
    def micros(v: Any): Option[Long] = v match {
      case t: java.sql.Timestamp => Some(t.getTime * 1000L + t.getNanos / 1000 % 1000)
      case i: java.time.Instant  => Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
      case _                     => None
    }
    def long(v: Any): Option[Long] = v match {
      case l: Long => Some(l); case i: Int => Some(i.toLong); case _ => None
    }
    val accepted = filters.filter {
      case GreaterThan("sequenceNumber", v) =>
        long(v).exists { l => minSeqNo = max(minSeqNo, l + 1); true }
      case GreaterThanOrEqual("sequenceNumber", v) =>
        long(v).exists { l => minSeqNo = max(minSeqNo, l); true }
      case LessThan("sequenceNumber", v) =>
        long(v).exists { l => maxSeqNoEx = min(maxSeqNoEx, l); true }
      case LessThanOrEqual("sequenceNumber", v) =>
        long(v).exists { l => maxSeqNoEx = min(maxSeqNoEx, l + 1); true }
      case EqualTo("sequenceNumber", v) =>
        long(v).exists { l =>
          minSeqNo = max(minSeqNo, l); maxSeqNoEx = min(maxSeqNoEx, l + 1); true
        }
      case GreaterThanOrEqual("enqueuedTime", v) =>
        micros(v).exists { us => minTimeUs = max(minTimeUs, us); true }
      case GreaterThan("enqueuedTime", v) =>
        micros(v).exists { us => minTimeUs = max(minTimeUs, us + 1); true }
      case _ => false
    }
    pushed = accepted
    // All filters (accepted included) remain residuals for Spark to evaluate;
    // our pushdown only narrows scan ranges.
    filters
  }
  private def max(cur: Option[Long], v: Long) = Some(cur.fold(v)(math.max(_, v)))
  private def min(cur: Option[Long], v: Long) = Some(cur.fold(v)(math.min(_, v)))

  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  // limit is applied per-partition (each partition returns <= l rows);
  // Spark still applies the global limit above.
  override def isPartiallyPushed(): Boolean = true

  /**
   * Metadata aggregate pushdown (the SQL face of ref S5's count-without-scan,
   * EventHubsRDD.scala:59-89): `COUNT(*)`, `MIN(sequenceNumber)` and
   * `MAX(sequenceNumber)` — optionally grouped by `partition` — are pure
   * offset arithmetic on the translated [from, until) ranges, so the scan
   * answers them from partition metadata without decoding a single event.
   * Pushdown is PARTIAL (`supportCompletePushDown` stays false): the scan
   * emits one pre-aggregated row per log partition and Spark's final
   * aggregate folds them (count -> sum), which keeps the contract trivially
   * correct under any future multi-range planning. Declined whenever any
   * predicate is present — our pushed filters are range-narrowing HINTS
   * re-evaluated as residuals, and residual evaluation needs real rows.
   */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = false

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (sawFilters || limit.isDefined) return false
    def isCol(e: org.apache.spark.sql.connector.expressions.Expression, name: String): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.sameElements(Array(name))
        case _ => false
      }
    val groupByPartition = agg.groupByExpressions.toSeq match {
      case Seq() => false
      case Seq(e) if isCol(e, "partition") => true
      case _ => return false
    }
    val kinds = agg.aggregateExpressions.map {
      case _: CountStar => EventLogAggScan.KindCount
      case m: Min if isCol(m.column, "sequenceNumber") => EventLogAggScan.KindMinSeq
      case m: Max if isCol(m.column, "sequenceNumber") => EventLogAggScan.KindMaxSeq
      case _ => return false
    }
    pushedAgg = Some((groupByPartition, kinds.toSeq))
    true
  }

  override def build(): Scan = pushedAgg match {
    case Some((groupByPartition, kinds)) =>
      new EventLogAggScan(conf, groupByPartition, kinds)
    case None =>
      new EventLogScan(conf, prunedSchema, minSeqNo, maxSeqNoEx, minTimeUs, limit)
  }
}

object EventLogAggScan {
  val KindCount = 0
  val KindMinSeq = 1
  val KindMaxSeq = 2
}

/**
 * Metadata-only aggregate scan: per-partition (count, minSeq, maxSeq) rows
 * derived from the same translated ranges a full scan would read — start/end
 * position options (seqNo / enqueuedTime / byte-offset, global or
 * per-partition) all apply — but with zero row decoding. Grouped form skips
 * empty partitions (a row-level GROUP BY would produce no group for them);
 * global form always emits its one combined row so `COUNT(*)` of an empty
 * log folds to 0, not null.
 */
class EventLogAggScan(conf: EventLogConf, groupByPartition: Boolean, kinds: Seq[Int])
    extends Scan with Batch with SupportsReportStatistics {
  import EventLogAggScan._

  override def readSchema(): StructType = {
    val aggFields = kinds.map {
      case KindCount  => StructField("count(*)", LongType, nullable = false)
      case KindMinSeq => StructField("min(sequenceNumber)", LongType)
      case KindMaxSeq => StructField("max(sequenceNumber)", LongType)
    }
    StructType(
      (if (groupByPartition) Seq(StructField("partition", StringType)) else Nil) ++ aggFields)
  }

  override def description(): String = {
    val names = kinds.map {
      case KindCount => "count(*)"; case KindMinSeq => "min(seq)"; case KindMaxSeq => "max(seq)"
    }
    s"graft-eventlog ${conf.name} [metadata-agg ${names.mkString(",")}" +
      (if (groupByPartition) " group by partition" else "") + "]"
  }

  override def toBatch: Batch = this

  /** (pid, count, minSeq, maxSeq) per non-degenerate group, driver-side. */
  private def aggRows(): Array[(String, Long, Long, Long)] = {
    val ranges =
      new EventLogScan(conf, EventLogTable.schema, None, None, None, None).planRanges()
    val perPartition = ranges.map { r =>
      (r.partitionId.toString, r.count, r.fromSeqNo, r.untilSeqNo - 1)
    }
    if (groupByPartition) perPartition.filter(_._2 > 0)
    else {
      val n = perPartition.map(_._2).sum
      val nonEmpty = perPartition.filter(_._2 > 0)
      val minSeq = if (nonEmpty.isEmpty) -1L else nonEmpty.map(_._3).min
      val maxSeq = if (nonEmpty.isEmpty) -1L else nonEmpty.map(_._4).max
      Array(("", n, minSeq, maxSeq))
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    Array(EventLogAggResultPartition(aggRows(), groupByPartition, kinds))

  override def createReaderFactory(): PartitionReaderFactory = EventLogAggReaderFactory

  override def estimateStatistics(): Statistics = {
    val rows = aggRows().length.toLong
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(rows * 32L)
      override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
    }
  }
}

/** The pre-aggregated result rows ride in the partition itself — a handful
  * of longs per log partition, no executor-side log access at all. */
final case class EventLogAggResultPartition(
    rows: Array[(String, Long, Long, Long)],
    groupByPartition: Boolean,
    kinds: Seq[Int]) extends InputPartition

object EventLogAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[
      org.apache.spark.sql.catalyst.InternalRow] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val p = partition.asInstanceOf[EventLogAggResultPartition]
    new PartitionReader[InternalRow] {
      private val iter = p.rows.iterator
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!iter.hasNext) return false
        val (pid, count, minSeq, maxSeq) = iter.next()
        val aggValues = p.kinds.map {
          case EventLogAggScan.KindCount  => count: Any
          case EventLogAggScan.KindMinSeq => if (count > 0) (minSeq: Any) else null
          case EventLogAggScan.KindMaxSeq => if (count > 0) (maxSeq: Any) else null
        }
        val values =
          (if (p.groupByPartition) Seq(UTF8String.fromString(pid): Any) else Nil) ++ aggValues
        current = new GenericInternalRow(values.toArray)
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

class EventLogScan(
    conf: EventLogConf,
    prunedSchema: StructType,
    minSeqNo: Option[Long],
    maxSeqNoEx: Option[Long],
    minTimeUs: Option[Long],
    limit: Option[Int]) extends Scan with SupportsReportStatistics {

  override def readSchema(): StructType = prunedSchema
  override def description(): String =
    s"graft-eventlog ${conf.name} " +
      s"[start=${EventPosition.render(conf.startingPosition)}, " +
      s"end=${EventPosition.render(conf.endingPosition)}" +
      minSeqNo.map(v => s", minSeq=$v").getOrElse("") +
      maxSeqNoEx.map(v => s", maxSeqEx=$v").getOrElse("") +
      limit.map(v => s", limit=$v").getOrElse("") + "]"

  /** Batch ranges: translate start/end positions, clamp to retained bounds,
    * then narrow by pushed predicates and per-partition limit. */
  private[sources] def planRanges(): Array[OffsetRange] = {
    EventLogClients.validateForRead(conf)
    val client: EventLogClient = EventLogClients.forConf(conf)
    val name = conf.name
    val bounds = client.boundedSeqNos(name)
    // stable executor placement for batch scans too (ref S6) — keeps the
    // executor-side cursor/receiver caches warm across repeated queries
    val executors = org.apache.spark.graft.ExecutorDiscovery.sortedExecutors()
    bounds.toArray.sortBy(_._1).map { case (pid, (earliest, latest)) =>
      var from = client.translate(name, pid, conf.startingPositionFor(pid))
      var until = client.translate(name, pid, conf.endingPositionFor(pid))
      minTimeUs.foreach(us => from = math.max(from, client.seekEnqueuedTime(name, pid, us)))
      minSeqNo.foreach(v => from = math.max(from, v))
      maxSeqNoEx.foreach(v => until = math.min(until, v))
      if (from < earliest) {
        if (conf.failOnDataLoss) throw new IllegalStateException(
          s"requested seqNo $from for $name-$pid already aged out (earliest $earliest); " +
            "set failOnDataLoss=false to read from earliest instead")
        from = earliest
      }
      until = math.min(math.max(until, from), latest)
      limit.foreach(l => until = math.min(until, from + l))
      val np = NameAndPartition(name, pid)
      val loc = PlacementStrategy.locate(conf.placementStrategy, np, executors)
      OffsetRange(np, from, math.max(from, until), loc)
    }
  }

  override def toBatch: Batch = new EventLogBatch(conf, prunedSchema, () => planRanges())

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EventLogMicroBatchStream(conf, prunedSchema)

  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new EventsServedMetric)

  override def estimateStatistics(): Statistics = {
    val ranges = planRanges()
    val rows = ranges.map(_.count).sum
    new Statistics {
      override def sizeInBytes(): util.OptionalLong =
        util.OptionalLong.of(rows * EventLogTable.EstBytesPerEvent)
      override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
    }
  }
}

class EventLogBatch(conf: EventLogConf, schema: StructType, ranges: () => Array[OffsetRange])
    extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    // executorTrimmed: planning-only options (positions, rate caps,
    // placement) never serialize into tasks — ref EventHubsConf.trimmed
    val shipped = conf.executorTrimmed.options
    ranges().map(r => EventLogInputPartition(shipped, r): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new EventLogReaderFactory(schema)
}

/** One scan task = one offset range of one log partition (ref invariant
  * "RDD partition index == Event Hub partition",
  * EventHubsRDDPartition.scala:27). */
final case class EventLogInputPartition(options: Map[String, String], range: OffsetRange)
    extends InputPartition {
  override def preferredLocations(): Array[String] = range.preferredLoc.toArray
}

class EventLogReaderFactory(
    schema: StructType,
    receiveAcc: Option[org.apache.spark.util.CollectionAccumulator[ReceiveSample]] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[
      org.apache.spark.sql.catalyst.InternalRow] = {
    val p = partition.asInstanceOf[EventLogInputPartition]
    new EventLogPartitionReader(EventLogConf(p.options), p.range, schema, receiveAcc)
  }
}

/**
 * Row production: Event -> InternalRow projection for the (pruned) schema
 * (ref P1: EventHubsSourceProvider.scala:167-231). The executor-side read
 * goes through EventLogClients.forConf: parquet-backed logs are read directly
 * from the files on the executor (ParquetEventLog — no driver state), named
 * logs through the in-JVM registry; both are the local analog of the
 * reference's executor-cached receivers (C3: CachedEventHubsReceiver.scala).
 */
class EventLogPartitionReader(conf: EventLogConf, range: OffsetRange, schema: StructType,
    receiveAcc: Option[org.apache.spark.util.CollectionAccumulator[ReceiveSample]] = None)
    extends PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
  import org.apache.spark.unsafe.types.UTF8String

  private val startedNanos = System.nanoTime()
  private var rowsRead = 0L
  private val iter: Iterator[(SequenceNumber, Event)] =
    EventLogClients.forConf(conf)
      .receive(range.name, range.partitionId, range.fromSeqNo, range.count)
  private var current: InternalRow = _
  private val partitionStr = UTF8String.fromString(range.partitionId.toString)

  private def mapData(m: Map[String, String]) = {
    if (m == null) null
    else new ArrayBasedMapData(
      new GenericArrayData(m.keysIterator.map(UTF8String.fromString).toArray[Any]),
      new GenericArrayData(m.valuesIterator.map(UTF8String.fromString).toArray[Any]))
  }

  // column extractors resolved ONCE per reader from the pruned schema —
  // the row loop is the connector's hottest path and must not re-match
  // field names per row
  private val extractors: Array[(SequenceNumber, Event) => Any] =
    schema.fields.map[(SequenceNumber, Event) => Any] { f =>
      f.name match {
        case "body"             => (_, e) => e.body
        case "partition"        => (_, _) => partitionStr
        case "offset"           => (s, _) => UTF8String.fromString(s.toString)
        case "sequenceNumber"   => (s, _) => s
        case "enqueuedTime"     => (_, e) => e.enqueuedTimeMicros
        case "publisher"        =>
          (_, e) => if (e.publisher == null) null else UTF8String.fromString(e.publisher)
        case "partitionKey"     =>
          (_, e) => if (e.partitionKey == null) null else UTF8String.fromString(e.partitionKey)
        case "properties"       => (_, e) => mapData(e.properties)
        case "systemProperties" => (_, e) => mapData(e.systemProperties)
        case other => throw new IllegalStateException(s"unknown column $other")
      }
    }

  override def next(): Boolean = {
    if (!iter.hasNext) return false
    rowsRead += 1
    val (seqNo, e) = iter.next()
    val values = new Array[Any](extractors.length)
    var i = 0
    while (i < extractors.length) { values(i) = extractors(i)(seqNo, e); i += 1 }
    current = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = current

  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(new LongTaskMetric("eventsServed", rowsRead))

  /** Report receive metrics for adaptive throttling (ref R3: executor ->
    * driver; here the batch surrogate id is the range start, unique per
    * micro-batch for a progressing stream). */
  override def close(): Unit = {
    // release the underlying file reader when Spark abandons the scan early
    // (e.g. an un-pushed limit stops pulling mid-range)
    iter match {
      case c: AutoCloseable => c.close()
      case _                => ()
    }
    val elapsed = System.nanoTime() - startedNanos
    if (conf.slowPartitionAdjustment) {
      // local-mode fast path: reader and driver share a JVM, feed the
      // tracker directly (replaced, not duplicated, when the accumulator
      // delivers the same (partition, batch) sample)
      PartitionThrottler.forLog(conf.throttlerKey, conf.maxAcceptableBatchReceiveTimeMs)
        .record(range.fromSeqNo, range.partitionId, rowsRead, elapsed)
      // cluster path: ride Spark's accumulator channel back to the driver
      receiveAcc.foreach(_.add(
        ReceiveSample(range.fromSeqNo, range.partitionId, rowsRead, elapsed)))
    }
    conf.metricPlugin.foreach(
      _.onReceiveMetric(range.nameAndPartition, range.fromSeqNo, rowsRead, elapsed))
  }
}
