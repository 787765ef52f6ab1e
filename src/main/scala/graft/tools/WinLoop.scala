package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Diagnostic: loop the bench's windowed workload for ~90s so an external
  * jstack sampler can attribute the reduce task's per-batch time. Mirrors
  * Bench's headline configs (NO_CODEGEN, 1 state partition, tmpfs ckpt). */
object WinLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val loops = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      .config("spark.sql.streaming.stateStore.minDeltasForSnapshot", "1000")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
      .config("spark.sql.streaming.checkpointLocation", "/dev/shm/graft_wl_ckpt")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.streaming.LocalCheckpointFileManager")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.addShutdownHook {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File("/dev/shm/graft_wl_ckpt"))
    }
    graft.GraftEventLog.readParquetLog(spark, s"$sfDir/events.parquet", 4)
      .agg(sum(length(col("body")))).collect()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    println("PID=" + ProcessHandle.current().pid())
    val parts = if (args.length > 2) args(2).split(",").toSeq
      else Seq("1", "2", "4", "8")
    for (i <- 1 to loops; p <- parts) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      val out = s"wl_${i}_$p"
      val t0 = System.nanoTime()
      val q = spark.readStream.format(graft.GraftEventLog.Format)
        .option("path", s"$sfDir/events.parquet").option("partitions", "4")
        .option("maxEventsPerTrigger", "4000").load()
        .withWatermark("enqueuedTime", "10 seconds")
        .groupBy(window(col("enqueuedTime"), "5 seconds"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(out).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(600000)
      println(f"W loop $i parts=$p: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
