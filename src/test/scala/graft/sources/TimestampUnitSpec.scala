package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.Types
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Timestamp-unit matrix for the connector's parquet decoder: the SAME
 * assertions run against seed files whose `ts` column is written as
 * INT64 TIMESTAMP in NANOS, MICROS and MILLIS. The decoder branches on the
 * footer's logical-type unit (ParquetEventLog `tsUnit`), but until this
 * spec only NANOS (driver testdata, pre-round-8) and MICROS (Spark-written
 * fixtures) were exercised — and the round-8 testdata regeneration proved
 * unit drift is a real hazard. Spark itself cannot write NANOS, so the
 * files are written directly with parquet-java's example writer.
 */
class TimestampUnitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val RowsTotal = 100
  private val Partitions = 4

  /** Write a 100-row event log with ts = event_id seconds in `unit`. */
  private def writeSeed(unit: TimeUnit, perSecond: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"pq-unit-$unit").toString
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false, unit)).named("ts")
      .required(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props")
      .required(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type")
      .named("events")
    val writer = ExampleParquetWriter.builder(new Path(s"$dir/part-0.parquet"))
      .withType(schema).build()
    val fac = new SimpleGroupFactory(schema)
    try {
      (0 until RowsTotal).foreach { id =>
        val g = fac.newGroup()
        g.append("event_id", id.toLong)
        g.append("ts", id.toLong * perSecond)
        g.append("props", s"p$id")
        g.append("event_type", "t")
        writer.write(g)
      }
    } finally writer.close()
    dir
  }

  private val units = Seq(
    (TimeUnit.NANOS, 1000000000L),
    (TimeUnit.MICROS, 1000000L),
    (TimeUnit.MILLIS, 1000L))

  for ((unit, perSecond) <- units) {
    test(s"$unit seed: bounds, payloads, enqueued-time micros, time seek") {
      val dir = writeSeed(unit, perSecond)
      val name = EventLogConf.parquetLogName(dir, Partitions)
      ParquetEventLog.invalidate(dir)

      // footer-arithmetic bounds: 100 dense ids over 4 partitions
      val bounds = ParquetEventLog.boundedSeqNos(name)
      assert(bounds.keySet == (0 until Partitions).toSet)
      bounds.foreach { case (pid, (earliest, latest)) =>
        assert(earliest == 0L && latest == RowsTotal / Partitions, s"pid $pid")
      }

      // range read: partition 1 holds ids 1, 5, 9, ... — seq s => id 1+4s;
      // enqueuedTimeMicros must be unit-normalized to micros
      val got = ParquetEventLog.receive(name, 1, 10, 5).toVector
      assert(got.map(_._1) == (10L to 14L).toVector)
      got.foreach { case (seq, e) =>
        val id = 1 + seq * Partitions
        assert(new String(e.body, "UTF-8") == s"p$id", s"seq $seq")
        assert(e.properties("event_type") == "t")
        assert(e.enqueuedTimeMicros == id * 1000000L,
          s"seq $seq: expected micros ${id * 1000000L}, got ${e.enqueuedTimeMicros}")
      }

      // time seek takes MICROS regardless of the file's unit: first seqNo
      // with ts >= 50 s; partition p holds ids p, p+4, ... => id >= 50 first
      // at ceil((50 - p) / 4)
      val cutoffUs = 50L * 1000000L
      for (p <- 0 until Partitions) {
        val expected = (0 until RowsTotal / Partitions)
          .find(s => (p + s * Partitions).toLong * 1000000L >= cutoffUs).get.toLong
        assert(ParquetEventLog.seekEnqueuedTime(name, p, cutoffUs) == expected,
          s"unit=$unit pid=$p")
      }
      // past-the-end seek clamps to latest
      for (p <- 0 until Partitions)
        assert(ParquetEventLog.seekEnqueuedTime(name, p, Long.MaxValue / 2) ==
          bounds(p)._2)

      // end-to-end through the DSv2 connector
      assert(graft.GraftEventLog.readParquetLog(spark, dir, Partitions).count() ==
        RowsTotal)
    }
  }
}
