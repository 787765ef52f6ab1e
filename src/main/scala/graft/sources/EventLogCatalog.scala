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

  private def logName(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.isEmpty, "graft catalog has a single flat namespace")
    EventLogRegistry.names.map(n => Identifier.of(Array.empty, n)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val n = logName(ident)
    if (n.startsWith("parquet:")) {
      // file-backed logs are addressable too:
      //   SELECT * FROM graft.`parquet:/data/events.parquet#4`
      val (path, partitions) = ParquetEventLog.parseName(n)
      new EventLogTable(EventLogConf(
        Map("path" -> path, "partitions" -> partitions.toString)))
    } else if (EventLogRegistry.exists(n)) {
      // stored TBLPROPERTIES (startingPosition, maxEventsPerTrigger, ...)
      // flow back into the table conf so pure-SQL users control admission
      new EventLogTable(EventLogConf(
        EventLogCatalog.propsOf(n) + ("name" -> n)))
    } else throw new NoSuchTableException((ident.namespace() :+ ident.name()).toSeq)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val n = logName(ident)
    if (EventLogRegistry.exists(n))
      throw new TableAlreadyExistsException((ident.namespace() :+ ident.name()).toSeq)
    // the row schema is the connector's fixed 9-column contract; a declared
    // schema is ignored (ACCEPT_ANY_SCHEMA governs writes)
    // every non-reserved property becomes a connector option — validated NOW
    // so a typo'd CREATE TABLE fails instead of silently dropping the knob
    val opts = properties.asScala.toMap
      .map { case (k, v) => k.toLowerCase -> v } -- EventLogCatalog.ReservedProps
    // read partitions from the LOWERCASED map: TBLPROPERTIES keys arrive in
    // user case, and a case-sensitive miss would silently use the default
    val p = opts.get("partitions").map(_.toInt)
      .getOrElse(types.DefaultPartitionCount)
    val conf = EventLogConf(opts + ("name" -> n, "partitions" -> p.toString)).validated()
    EventLogRegistry.create(n, p)
    EventLogCatalog.storeProps(n, opts + ("partitions" -> p.toString))
    new EventLogTable(conf)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("event logs have a fixed schema")

  override def dropTable(ident: Identifier): Boolean = {
    val n = logName(ident)
    val existed = EventLogRegistry.exists(n)
    EventLogRegistry.drop(n)
    EventLogCatalog.dropProps(n)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("event logs cannot be renamed")

  override def tableExists(ident: Identifier): Boolean = {
    val n = logName(ident)
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
