package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

import types._

/**
 * Write path: `df.write.format("graft-eventlog")` (batch) and
 * `df.writeStream.format("graft-eventlog")` (streaming).
 *
 * Schema contract identical to the reference sink (ref:
 * core/.../EventHubsWriter.scala:41-70, EventHubsWriteTask.scala:118-218):
 *   body            STRING | BINARY   required
 *   partition(/Id)  STRING            optional, mutually exclusive with key
 *   partitionKey    STRING            optional
 *   properties      MAP<STRING,STRING> optional, no null keys/values
 * Extra columns are ignored (attributes are resolved by name).
 *
 * Delivery: tasks STAGE their rows into the log executor-side under a
 * per-(query, epoch, partition, task) key; the commit message carries only
 * that key and a count (O(1) — the written data never moves to the driver).
 * Driver commit atomically publishes exactly the keys of the tasks Spark
 * reports successful and discards stale/speculative attempts of the same
 * epoch, which upgrades the reference's at-least-once contract to
 * idempotent-per-batch (streaming epochs are additionally skipped when
 * already committed, ref EventHubsSink.scala:35-42). A remote backend
 * implements stage/publish as a transactional produce or degrades to
 * at-least-once task sends, exactly like the reference.
 */
object EventLogWriteSupport {
  /** last committed streaming epoch per (log, queryId) for idempotent restart */
  private val committedEpochs = new ConcurrentHashMap[(String, String), Long]()

  def alreadyCommitted(name: String, queryId: String, epochId: Long): Boolean = {
    val last = committedEpochs.getOrDefault((name, queryId), Long.MinValue)
    epochId <= last
  }
  def markCommitted(name: String, queryId: String, epochId: Long): Unit =
    committedEpochs.merge((name, queryId), epochId, (a, b) => math.max(a, b))

  final case class ColumnPlan(
      bodyIdx: Int, bodyIsString: Boolean,
      partitionIdx: Int, partitionKeyIdx: Int, propertiesIdx: Int)

  /** Validate the written schema and resolve column positions
    * (ref: EventHubsWriter.validateQuery + EventHubsWriteTask.createProjection). */
  def plan(schema: StructType): ColumnPlan = {
    def idx(names: String*): Int =
      schema.fields.indexWhere(f => names.exists(_.equalsIgnoreCase(f.name)))
    val bodyIdx = idx("body")
    if (bodyIdx < 0)
      throw new IllegalArgumentException("required attribute 'body' not found in write schema")
    val bodyIsString = schema.fields(bodyIdx).dataType match {
      case StringType => true
      case BinaryType => false
      case dt => throw new IllegalArgumentException(
        s"'body' must be STRING or BINARY, got ${dt.simpleString}")
    }
    val pIdx = idx("partition", "partitionId")
    if (pIdx >= 0 && schema.fields(pIdx).dataType != StringType)
      throw new IllegalArgumentException(
        s"'${schema.fields(pIdx).name}' must be STRING, got ${schema.fields(pIdx).dataType.simpleString}")
    val kIdx = idx("partitionKey")
    if (kIdx >= 0 && schema.fields(kIdx).dataType != StringType)
      throw new IllegalArgumentException(
        s"'partitionKey' must be STRING, got ${schema.fields(kIdx).dataType.simpleString}")
    if (pIdx >= 0 && kIdx >= 0)
      throw new IllegalArgumentException(
        "'partition' and 'partitionKey' are mutually exclusive in the write schema")
    val propIdx = idx("properties")
    if (propIdx >= 0) schema.fields(propIdx).dataType match {
      case MapType(StringType, StringType, _) => ()
      case dt => throw new IllegalArgumentException(
        s"'properties' must be MAP<STRING,STRING>, got ${dt.simpleString}")
    }
    ColumnPlan(bodyIdx, bodyIsString, pIdx, kIdx, propIdx)
  }

  /** Decode one written row against a validated plan: (explicit target
    * partition, partition key, event) — shared by the in-memory and
    * durable writers so the sink's validation error matrix cannot drift
    * between backends. */
  def decodeRow(row: InternalRow, plan: ColumnPlan, numPartitions: Int)
      : (Option[Int], Option[String], Event) = {
    val body: Array[Byte] =
      if (row.isNullAt(plan.bodyIdx))
        throw new IllegalArgumentException("null 'body' in write")
      else if (plan.bodyIsString) row.getUTF8String(plan.bodyIdx).getBytes
      else row.getBinary(plan.bodyIdx)

    val pid: Option[Int] =
      if (plan.partitionIdx < 0 || row.isNullAt(plan.partitionIdx)) None
      else {
        val s = row.getUTF8String(plan.partitionIdx).toString
        val p = try s.toInt catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"invalid partition id '$s'")
        }
        if (p < 0 || p >= numPartitions)
          throw new IllegalArgumentException(
            s"partition id $p out of range [0, $numPartitions)")
        Some(p)
      }

    val key: Option[String] =
      if (plan.partitionKeyIdx < 0 || row.isNullAt(plan.partitionKeyIdx)) None
      else Some(row.getUTF8String(plan.partitionKeyIdx).toString)

    val props: Map[String, String] =
      if (plan.propertiesIdx < 0 || row.isNullAt(plan.propertiesIdx)) Map.empty
      else {
        val m = row.getMap(plan.propertiesIdx)
        val keys = m.keyArray(); val vals = m.valueArray()
        (0 until m.numElements()).map { i =>
          if (keys.isNullAt(i) || vals.isNullAt(i))
            throw new IllegalArgumentException(
              "null key or value in 'properties' map (ref EventHubsWriteTask.scala:125-128)")
          keys.getUTF8String(i).toString -> vals.getUTF8String(i).toString
        }.toMap
      }

    (pid, key,
      Event(body, enqueuedTimeMicros = System.currentTimeMillis() * 1000L,
        partitionKey = key.orNull, properties = props))
  }
}

class EventLogWriteBuilder(conf: EventLogConf, schema: StructType, queryId: String)
    extends WriteBuilder {
  override def build(): Write = {
    val plan = EventLogWriteSupport.plan(schema) // validate eagerly at planning
    if (conf.durablePath.isDefined)
      new DurableEventLogWrite(conf, schema, plan, queryId)
    else if (conf.path.isDefined)
      throw new IllegalArgumentException(
        "parquet-backed event logs are read-only; write to a named log or a " +
          "'durablePath' log instead")
    else new EventLogWrite(conf, schema, plan, queryId)
  }
}

/** O(1) commit message: where a successful task staged its rows, never the
  * rows themselves. */
final case class StagedEventsMessage(
    stagingKey: String, partitionId: Int, taskId: Long, count: Long)
    extends WriterCommitMessage

class EventLogWrite(
    conf: EventLogConf,
    schema: StructType,
    plan: EventLogWriteSupport.ColumnPlan,
    queryId: String) extends Write {

  private def epochPrefix(epochId: Long) = s"$queryId/$epochId/"

  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new StagedRowsMetric)

  /** Publish the successful tasks' staged buffers in deterministic
    * (partition, task) order; everything else staged for this epoch is a
    * failed/speculative attempt and is dropped. */
  private def publish(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val log = EventLogRegistry.ensure(conf)
    val staged = messages.collect { case m: StagedEventsMessage => m }
      .sortBy(m => (m.partitionId, m.taskId))
    val published = log.publishStaged(epochPrefix(epochId), staged.map(_.stagingKey).toSeq)
    val reported = staged.map(_.count).sum
    // reconcile: a staging buffer that vanished between task commit and
    // driver commit (log replaced, foreign JVM) must fail the batch loudly,
    // never report success over lost rows
    if (published != reported) throw new IllegalStateException(
      s"staged-write commit for '${conf.name}' epoch $epochId published $published " +
        s"of $reported reported rows — staging was lost before commit")
  }

  /** Abort: sweep staged attempts but leave the epoch OPEN — it may re-run
    * after a restart under the same (queryId, epochId), and closing it here
    * would silently drop the retry's staging (permanent wedge). */
  private def discard(epochId: Long): Unit = {
    val log = EventLogRegistry.ensure(conf)
    log.sweepStaged(epochPrefix(epochId))
  }

  /** Replay of an already-committed epoch: drop duplicates AND close the
    * epoch (it completed; nothing will ever legitimately stage to it again,
    * so late zombies must not park in staging forever). */
  private def discardReplayed(epochId: Long): Unit = {
    val log = EventLogRegistry.ensure(conf)
    log.publishStaged(epochPrefix(epochId), Nil)
    ()
  }

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new EventLogWriterFactory(conf.name, schema, plan,
        EventLogRegistry.ensure(conf).numPartitions, queryId)
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      publish(EventLogWrite.BatchEpochIdValue, messages)
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      discard(EventLogWrite.BatchEpochIdValue)
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      new EventLogWriterFactory(conf.name, schema, plan,
        EventLogRegistry.ensure(conf).numPartitions, queryId)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val name = conf.name
      if (!EventLogWriteSupport.alreadyCommitted(name, queryId, epochId)) {
        publish(epochId, messages)
        EventLogWriteSupport.markCommitted(name, queryId, epochId)
      } else discardReplayed(epochId) // replayed epoch: drop re-staged duplicates
    }
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      discard(epochId)
  }
}

object EventLogWrite {
  /** Epoch tag for one-shot batch writes (each batch write has a fresh
    * queryId, so the constant cannot collide across jobs). */
  val BatchEpochIdValue: Long = -1L
}

class EventLogWriterFactory(
    logName: String,
    schema: StructType,
    plan: EventLogWriteSupport.ColumnPlan,
    numPartitions: Int,
    queryId: String)
    extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new EventLogDataWriter(logName, schema, plan, numPartitions,
      queryId, EventLogWrite.BatchEpochIdValue, partitionId, taskId)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new EventLogDataWriter(logName, schema, plan, numPartitions,
      queryId, epochId, partitionId, taskId)
}

/** Per-task row writer (ref S9: EventHubsWriteTask.scala:59-67,136-154):
  * buffers rows task-locally, stages them into the log on task commit. */
class EventLogDataWriter(
    logName: String,
    schema: StructType,
    plan: EventLogWriteSupport.ColumnPlan,
    numPartitions: Int,
    queryId: String,
    epochId: Long,
    partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {

  private val stagingKey = s"$queryId/$epochId/$partitionId/$taskId"
  private val buf =
    scala.collection.mutable.ArrayBuffer.empty[(Option[Int], Option[String], Event)]

  override def write(row: InternalRow): Unit =
    buf += EventLogWriteSupport.decodeRow(row, plan, numPartitions)

  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(new LongTaskMetric("stagedRows", buf.length.toLong))

  override def commit(): WriterCommitMessage = {
    // stage executor-side; only the key travels in the commit message
    EventLogRegistry.get(logName).stageAll(stagingKey, buf)
    StagedEventsMessage(stagingKey, partitionId, taskId, buf.length.toLong)
  }
  override def abort(): Unit = {
    buf.clear()
    EventLogRegistry.get(logName).discardStaged(stagingKey)
  }
  override def close(): Unit = ()
}

/**
 * Write into a DURABLE file-backed log ([[DurableEventLog]]): the same
 * staged two-phase commit as [[EventLogWrite]], with staging and replay
 * state on DISK — written events survive JVM exit, and a replayed epoch is
 * skipped by its on-disk commit marker, so idempotence holds across driver
 * restarts (the in-memory sink's committedEpochs map dies with the JVM).
 */
class DurableEventLogWrite(
    conf: EventLogConf,
    schema: StructType,
    plan: EventLogWriteSupport.ColumnPlan,
    queryId: String) extends Write {

  private val path = conf.durablePath.get
  private val partitions = {
    DurableEventLog.create(path, conf.partitions) // idempotent; count-checked
    DurableEventLog.partitionCount(conf.name)
  }

  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new StagedRowsMetric)

  private def publish(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect { case m: StagedEventsMessage => m }
      .sortBy(m => (m.partitionId, m.taskId))
    val published = DurableEventLog.publishStaged(
      path, queryId, epochId, staged.map(_.stagingKey).toSeq)
    val reported = staged.map(_.count).sum
    if (published >= 0 && published != reported) throw new IllegalStateException(
      s"durable staged-write commit for '$path' epoch $epochId published " +
        s"$published of $reported reported rows — staging was lost before commit")
  }

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new DurableEventLogWriterFactory(path, schema, plan, partitions, queryId)
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      publish(EventLogWrite.BatchEpochIdValue, messages)
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      DurableEventLog.sweepStaged(path, queryId, EventLogWrite.BatchEpochIdValue)
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      new DurableEventLogWriterFactory(path, schema, plan, partitions, queryId)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      publish(epochId, messages) // marker-checked inside: replay sweeps + skips
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      DurableEventLog.sweepStaged(path, queryId, epochId)
  }
}

class DurableEventLogWriterFactory(
    path: String,
    schema: StructType,
    plan: EventLogWriteSupport.ColumnPlan,
    numPartitions: Int,
    queryId: String)
    extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DurableEventLogDataWriter(path, schema, plan, numPartitions,
      queryId, EventLogWrite.BatchEpochIdValue, partitionId, taskId)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new DurableEventLogDataWriter(path, schema, plan, numPartitions,
      queryId, epochId, partitionId, taskId)
}

/** Per-task durable writer: routes rows to their target partition at write
  * time (explicit partition > key hash > task-offset round-robin — the
  * in-memory log's routing, minus the shared counter a multi-JVM write
  * cannot have), stages per-partition parquet files on task commit. */
class DurableEventLogDataWriter(
    path: String,
    schema: StructType,
    plan: EventLogWriteSupport.ColumnPlan,
    numPartitions: Int,
    queryId: String,
    epochId: Long,
    partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {

  private val byPid = scala.collection.mutable.HashMap.empty[Int, scala.collection.mutable.ArrayBuffer[Event]]
  private var rows = 0L
  private var rr = partitionId.toLong // spread unkeyed rows across tasks

  override def write(row: InternalRow): Unit = {
    val (pid, key, e) = EventLogWriteSupport.decodeRow(row, plan, numPartitions)
    val target = pid.getOrElse(
      key.map(k => math.floorMod(k.hashCode, numPartitions)).getOrElse {
        val t = math.floorMod(rr, numPartitions.toLong).toInt
        rr += 1
        t
      })
    byPid.getOrElseUpdate(target, scala.collection.mutable.ArrayBuffer.empty) += e
    rows += 1
  }

  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(new LongTaskMetric("stagedRows", rows))

  override def commit(): WriterCommitMessage = {
    val taskDir = DurableEventLog.stageTask(path, queryId, epochId,
      partitionId, taskId, byPid.view.mapValues(_.toSeq).toMap)
    StagedEventsMessage(taskDir, partitionId, taskId, rows)
  }
  override def abort(): Unit = {
    byPid.clear()
    DurableEventLog.discardTask(path, queryId, epochId, partitionId, taskId)
  }
  override def close(): Unit = ()
}
