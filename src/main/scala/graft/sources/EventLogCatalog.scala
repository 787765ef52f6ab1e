package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * DSv2 TableCatalog over the event-log registry: with
 * `spark.sql.catalog.graft=graft.sources.EventLogCatalog`, logs are plain
 * SQL tables —
 *
 *   CREATE TABLE graft.hub TBLPROPERTIES ('partitions'='4')
 *   INSERT INTO graft.hub SELECT body, partitionKey FROM staged
 *   SELECT partition, count(*) FROM graft.hub GROUP BY 1
 *
 * A one-level namespace names a CONSUMER GROUP over an existing log (ref
 * EventHubsConf.scala:205 — the reference's consumerGroup option, here as
 * the idiomatic SQL addressing form):
 *
 *   SELECT * FROM graft.analytics.hub    -- log 'hub', consumer group
 *                                        -- 'analytics': its own isolated
 *                                        -- adaptive-throttling state (and
 *                                        -- checkpoints isolate offsets)
 *
 * Group namespaces address existing logs only — CREATE/DROP go through the
 * flat name, so a group can never create or destroy the shared log.
 *
 * The reference exposes logs only through the DataFrame reader options;
 * a catalog is the idiomatic Spark 4 surface for the same capability and
 * costs nothing extra — the Table returned is the same EventLogTable the
 * format("graft-eventlog") path plans through.
 */
class EventLogCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  /** (log name, consumer group): `graft.hub` -> (hub, None);
    * `graft.g.hub` -> (hub, Some(g)). Deeper nesting is not a table. */
  private def split(ident: Identifier): (String, Option[String]) =
    ident.namespace() match {
      case Array()      => (ident.name(), None)
      case Array(group) => (ident.name(), Some(group))
      case ns => throw new NoSuchTableException((ns :+ ident.name()).toSeq)
    }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    // every log is addressable under every consumer-group namespace
    require(namespace.length <= 1,
      "graft namespaces are single-level consumer groups: graft.<group>.<log>")
    EventLogRegistry.names.map(n => Identifier.of(namespace, n)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val (n, group) = split(ident)
    val groupOpt = group.map(g => "consumergroup" -> g).toMap
    if (n.startsWith("parquet:")) {
      // file-backed logs are addressable too:
      //   SELECT * FROM graft.`parquet:/data/events.parquet#4`
      val (path, partitions) = ParquetEventLog.parseName(n)
      new EventLogTable(EventLogConf(
        Map("path" -> path, "partitions" -> partitions.toString) ++ groupOpt))
    } else if (EventLogRegistry.exists(n)) {
      // stored TBLPROPERTIES (startingPosition, maxEventsPerTrigger, ...)
      // flow back into the table conf so pure-SQL users control admission;
      // the namespace's consumer group overrides any stored default
      new EventLogTable(EventLogConf(
        EventLogCatalog.propsOf(n) + ("name" -> n) ++ groupOpt))
    } else throw new NoSuchTableException((ident.namespace() :+ ident.name()).toSeq)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val (n, group) = split(ident)
    group.foreach(g => throw new UnsupportedOperationException(
      s"consumer-group namespaces address existing logs; create the log as " +
        s"$catalogName.$n, then read it as $catalogName.$g.$n"))
    if (EventLogRegistry.exists(n))
      throw new TableAlreadyExistsException((ident.namespace() :+ ident.name()).toSeq)
    // the row schema is the connector's fixed 9-column contract; a declared
    // schema is ignored (ACCEPT_ANY_SCHEMA governs writes)
    // every non-reserved property becomes a connector option — validated NOW
    // so a typo'd CREATE TABLE fails instead of silently dropping the knob.
    // Secrets are sealed BEFORE the props are stored: catalog-persisted
    // TBLPROPERTIES must never hold a plaintext credential
    val opts = EventLogConf.sealSecrets(properties.asScala.toMap
      .map { case (k, v) => k.toLowerCase -> v }) -- EventLogCatalog.ReservedProps
    // read partitions from the LOWERCASED map: TBLPROPERTIES keys arrive in
    // user case, and a case-sensitive miss would silently use the default
    val p = opts.get("partitions").map(_.toInt)
      .getOrElse(types.DefaultPartitionCount)
    val conf = EventLogConf(opts ++ Map("name" -> n, "partitions" -> p.toString)).validated()
    EventLogRegistry.create(n, p)
    EventLogCatalog.storeProps(n, opts + ("partitions" -> p.toString))
    new EventLogTable(conf)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("event logs have a fixed schema")

  override def dropTable(ident: Identifier): Boolean = {
    val (n, group) = split(ident)
    group.foreach(g => throw new UnsupportedOperationException(
      s"a consumer group cannot drop the shared log; drop it as $catalogName.$n"))
    val existed = EventLogRegistry.exists(n)
    EventLogRegistry.drop(n)
    EventLogCatalog.dropProps(n)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("event logs cannot be renamed")

  override def tableExists(ident: Identifier): Boolean = {
    if (ident.namespace().length > 1) return false
    val (n, _) = split(ident)
    if (n.startsWith("parquet:"))
      try { ParquetEventLog.validate(ParquetEventLog.parseName(n)._1); true }
      catch { case _: Exception => false }
    else EventLogRegistry.exists(n)
  }
}

object EventLogCatalog {
  /** Spark-managed table metadata keys — not connector options. */
  private[sources] val ReservedProps: Set[String] =
    Set("provider", "location", "comment", "owner", "external")

  // TBLPROPERTIES live beside the registry's logs (same JVM-wide lifetime),
  // so a table created in one session keeps its conf in every session.
  private val props =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  private[sources] def storeProps(name: String, p: Map[String, String]): Unit =
    props.put(name, p)
  private[sources] def propsOf(name: String): Map[String, String] =
    Option(props.get(name)).getOrElse(Map.empty)
  private[sources] def dropProps(name: String): Unit = props.remove(name)
}
