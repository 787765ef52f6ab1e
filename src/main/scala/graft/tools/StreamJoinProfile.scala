package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Diagnostic for the stream-stream interval join gates (q_stream_join/
  * _outer): per-batch durationMs components and state-operator timings
  * (allUpdatesTimeMs / commitTimeMs / numRowsTotal), across state-store
  * providers and state-partition counts — answers "is the 2.2 s wall time
  * state-commit volume, banding fan-out, or fixed streaming overhead?". */
object StreamJoinProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.streaming.LocalCheckpointFileManager")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the cursor registry + codegen
    runOnce(spark, "/root/testdata/sf0.001", parts = 4, label = "warmup", verbose = false)

    for (parts <- Seq(4, 8, 16)) {
      runOnce(spark, sfDir, parts, s"hdfs-backed parts=$parts", verbose = true)
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    runOnce(spark, sfDir, parts = 4, label = "rocksdb parts=4", verbose = true)
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    // no banding: raw (pid) equality key + range predicate only — measures
    // what the bucket fan-out buys vs costs
    runOnce(spark, sfDir, parts = 4, label = "no-banding parts=4",
      verbose = true, banded = false)
    spark.stop()
  }

  private def runOnce(spark: SparkSession, sfDir: String, parts: Int,
      label: String, verbose: Boolean, banded: Boolean = true): Unit = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    val out = "sjp_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val bucketUs = 600L * 1000000L
    val t0 = System.nanoTime()
    try {
      def side(t: String) = spark.readStream.format(graft.GraftEventLog.Format)
        .option("path", s"$sfDir/events.parquet").option("partitions", "4")
        .option("maxEventsPerTrigger", Long.MaxValue.toString)
        .load()
        .filter(col("properties")("event_type") === t)
        .withWatermark("enqueuedTime", "1 hour")
      val clicksBase = side("click")
        .select(col("partition").as("c_pid"),
          col("sequenceNumber").as("c_seq"), col("enqueuedTime").as("c_time"),
          floor(unix_micros(col("enqueuedTime")) / bucketUs).as("b"))
      val clicks =
        if (banded) clicksBase
          .withColumn("c_bkt", explode(array(col("b") - 1, col("b"), col("b") + 1)))
          .drop("b")
        else clicksBase.drop("b")
      val errors0 = side("error").select(col("partition").as("e_pid"),
        col("enqueuedTime").as("e_time"),
        floor(unix_micros(col("enqueuedTime")) / bucketUs).as("e_bkt"))
      val errors = if (banded) errors0 else errors0.drop("e_bkt")
      val cond =
        if (banded)
          col("c_pid") === col("e_pid") && col("c_bkt") === col("e_bkt") &&
            col("e_time") >= col("c_time") - expr("INTERVAL 5 MINUTES") &&
            col("e_time") <= col("c_time") + expr("INTERVAL 5 MINUTES")
        else
          col("c_pid") === col("e_pid") &&
            col("e_time") >= col("c_time") - expr("INTERVAL 5 MINUTES") &&
            col("e_time") <= col("c_time") + expr("INTERVAL 5 MINUTES")
      val q = clicks.join(errors, cond, "inner")
        .writeStream.format("memory").queryName(out).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      if (verbose) {
        println(f"=== $label: wall=$wall%.2fs, result rows=${spark.table(out).count()}")
        q.recentProgress.foreach { p =>
          val dur = p.durationMs
          println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
            s"durationMs={addBatch=${dur.get("addBatch")}, " +
            s"getBatch=${dur.get("getBatch")}, latestOffset=${dur.get("latestOffset")}, " +
            s"queryPlanning=${dur.get("queryPlanning")}, " +
            s"commitOffsets=${dur.get("commitOffsets")}, " +
            s"walCommit=${dur.get("walCommit")}}")
          p.stateOperators.foreach { so =>
            println(s"    state: rowsTotal=${so.numRowsTotal} " +
              s"updated=${so.numRowsUpdated} updTime=${so.allUpdatesTimeMs}ms " +
              s"removed=${so.numRowsRemoved} rmTime=${so.allRemovalsTimeMs}ms " +
              s"commit=${so.commitTimeMs}ms mem=${so.memoryUsedBytes}")
          }
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
