package graft.tools

import org.apache.spark.metrics.source.CodegenMetrics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Diagnostic: decompose the DEFAULT-codegen windowed workload's overhead vs
 * the NO_CODEGEN criterion series. Runs the bench's windowed workload in a
 * (codegen on/off) x (state partitions) matrix and reports, per run: wall
 * seconds, per-batch durationMs totals (addBatch / queryPlanning /
 * walCommit / state commit), and the Janino compilation delta from
 * CodegenMetrics (how many classes were compiled during the run and the
 * generated-source bytes) — if the advancing watermark literal defeats the
 * codegen cache, compile count grows per BATCH, not per QUERY.
 *
 * Usage: runMain graft.tools.CodegenLoop [sfDir] [loops] [partsCsv]
 */
object CodegenLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val loops = if (args.length > 1) args(1).toInt else 3
    val parts = if (args.length > 2) args(2).split(",").toSeq else Seq("4", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      .config("spark.sql.streaming.stateStore.minDeltasForSnapshot", "1000")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
      .config("spark.sql.streaming.checkpointLocation", "/dev/shm/graft_cgl_ckpt")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.streaming.LocalCheckpointFileManager")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.addShutdownHook {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File("/dev/shm/graft_cgl_ckpt"))
    }
    graft.GraftEventLog.readParquetLog(spark, s"$sfDir/events.parquet", 4)
      .agg(sum(length(col("body")))).collect()

    def compiles(): (Long, Long, Long) = (
      CodegenMetrics.METRIC_COMPILATION_TIME.getCount,
      math.round(CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getMean *
        CodegenMetrics.METRIC_COMPILATION_TIME.getCount),
      CodegenMetrics.METRIC_SOURCE_CODE_SIZE.getCount)

    def run(tag: String, agg: Boolean, p: String): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      val out = ("cgl_" + tag + "_" + p + "_" +
        java.util.UUID.randomUUID().toString.take(8)).replace("-", "")
      val (c0, t0c, _) = compiles()
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
      val sec = (System.nanoTime() - t0) / 1e9
      val (c1, t1c, _) = compiles()
      val prog = q.recentProgress
      def tot(k: String) = prog.map(pr =>
        Option(pr.durationMs.get(k)).map(_.longValue()).getOrElse(0L)).sum
      println(f"$tag%-12s parts=$p%-3s wall=$sec%6.2fs batches=${prog.length}%3d " +
        f"addBatch=${tot("addBatch")}%5d plan=${tot("queryPlanning")}%5d " +
        f"wal=${tot("walCommit")}%4d off=${tot("commitOffsets")}%4d " +
        f"stCommit=${prog.flatMap(_.stateOperators).map(_.commitTimeMs).sum}%5d " +
        f"compiles=+${c1 - c0}%4d (~${t1c - t0c}%5d ms janino)")
    }

    // one stateful warmup on the tiny sf to absorb provider/codegen startup
    val warmSf = "/root/testdata/sf0.001"
    if (new java.io.File(s"$warmSf/events.parquet").exists()) {
      spark.readStream.format(graft.GraftEventLog.Format)
        .option("path", s"$warmSf/events.parquet").option("partitions", "4")
        .load()
        .withWatermark("enqueuedTime", "10 seconds")
        .groupBy(window(col("enqueuedTime"), "5 seconds"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("cglwarm").outputMode("append")
        .trigger(Trigger.AvailableNow()).start().awaitTermination(120000)
    }

    for (i <- 1 to loops; p <- parts) {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      run(s"nocodegen_$i", agg = true, p)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      run(s"codegen_$i", agg = true, p)
    }
    spark.stop()
  }
}
