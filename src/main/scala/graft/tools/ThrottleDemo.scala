package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{Event, EventLogRegistry, PartitionThrottler}

/**
 * Demonstrates slow-partition adaptive throttling end-to-end: partition 3
 * reports 10x receive time; subsequent micro-batches give it a smaller share
 * of the trigger budget. `sbt "runMain graft.tools.ThrottleDemo"`.
 */
object ThrottleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    EventLogRegistry.drop("throttled")
    val log = EventLogRegistry.create("throttled", 4)
    for (p <- 0 until 4; i <- 0 until 3000)
      log.append(p, Event(s"$p-$i".getBytes, i * 1000000L))

    // simulate a slow partition (the reference tests do exactly this through
    // their SimulatedPartitionStatusTracker); throttling state is keyed by
    // (log, consumer group), so use the conf's key
    val key = graft.sources.EventLogConf(Map("name" -> "throttled")).throttlerKey
    PartitionThrottler.drop(key)
    val t = PartitionThrottler.forLog(key)
    for (p <- 0 until 3) t.record(0L, p, 1000, (1000 * 0.2e6).toLong)
    t.record(0L, 3, 1000, (1000 * 2e6).toLong)

    val q = spark.readStream.format("graft-eventlog")
      .option("name", "throttled")
      .option("maxEventsPerTrigger", "4000")
      .option("slowPartitionAdjustment", "true")
      .option("metricPlugin", "graft.sources.SimpleLogMetricPlugin")
      .option("throttlingStatusPlugin", "graft.sources.SimpleThrottlingStatusPlugin")
      .load()
      .groupBy(col("partition")).agg(count(lit(1)).as("events_received"))
      .writeStream.format("console").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    println("per-partition delivery after batch 1 should show partition 3 behind:")
    spark.stop()
    println("THROTTLE DEMO OK")
  }
}
