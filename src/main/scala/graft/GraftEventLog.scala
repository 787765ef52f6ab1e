package graft

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

import graft.sources._

/**
 * User-facing facade over the graft event-log connector (the analog of the
 * reference's `EventHubsUtils`, core/.../EventHubsUtils.scala — but
 * DataFrame-first: everything returns through `format("graft-eventlog")`).
 */
object GraftEventLog {
  val Format = "graft-eventlog"

  /** Batch read of a named in-memory log. */
  def read(spark: SparkSession, name: String, options: Map[String, String] = Map.empty): DataFrame =
    withOptions(spark.read.format(Format).option("name", name), options).load()

  /** Batch read of a parquet-seeded event log (events table layout). */
  def readParquetLog(
      spark: SparkSession,
      path: String,
      partitions: Int = sources.types.DefaultPartitionCount,
      options: Map[String, String] = Map.empty): DataFrame =
    withOptions(
      spark.read.format(Format).option("path", path).option("partitions", partitions.toString),
      options).load()

  private def withOptions(r: DataFrameReader, options: Map[String, String]): DataFrameReader =
    options.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }

  /** Metadata-only count from offset-range arithmetic — no scan
    * (ref S5: EventHubsRDD.count, core/.../EventHubsRDD.scala:59-89).
    * Works for named logs and parquet-backed names (footer arithmetic). */
  def count(name: String): Long = {
    val client: EventLogClient =
      if (name.startsWith("parquet:")) ParquetEventLog else EventLogRegistry
    client.boundedSeqNos(name).values.map { case (e, l) => l - e }.sum
  }

  /** Metadata-only emptiness check (ref S5). */
  def isEmpty(name: String): Boolean = count(name) == 0L

  def create(name: String, partitions: Int): Unit = {
    EventLogRegistry.create(name, partitions); ()
  }
  def drop(name: String): Unit = EventLogRegistry.drop(name)
}
