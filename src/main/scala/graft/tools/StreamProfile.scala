package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Diagnostic: per-micro-batch duration breakdown for the bench's windowed
  * workload (BASELINE.md's demo-query shape) — prints each batch's
  * durationMs components and state-operator commit times. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parts = "4"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      .config("spark.sql.streaming.checkpointLocation", "/dev/shm/graft_sp_ckpt")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.streaming.LocalCheckpointFileManager")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftEventLog.readParquetLog(spark, s"$sfDir/events.parquet", 4).count()

    sys.addShutdownHook {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File("/dev/shm/graft_sp_ckpt"))
    }
    // warmup
    runOnce(spark, "/root/testdata/sf0.001", agg = true, verbose = false)
    def label(s: String): Unit = println(s"### $s")

    // stage-latency listener: wall (submit -> complete) vs summed task time
    // per stage, bucketed by task count, to separate scheduling overhead
    // from work
    val stageWall = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        for (s <- i.submissionTime; c <- i.completionTime)
          stageWall.put(i.stageId, (c - s, i.taskMetrics.executorRunTime, i.numTasks))
      }
    })
    def dumpStages(tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      val vs = stageWall.values.asScala.toSeq
      val byTasks = vs.groupBy(_._3).toSeq.sortBy(_._1)
      println(s"  [$tag] stages=${vs.size} " + byTasks.map { case (n, ss) =>
        s"tasks=$n: n=${ss.size} wallSum=${ss.map(_._1).sum} runSum=${ss.map(_._2).sum}"
      }.mkString(" | "))
      stageWall.clear()
    }

    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    label("P (bench shape)")
    runOnce(spark, sfDir, agg = false, verbose = true)
    dumpStages("P")
    label("W 1 state partition (bench r13 candidate)")
    runOnce(spark, sfDir, agg = true, verbose = true)
    dumpStages("W")
    label("W foreachBatch-count sink instead of memory sink")
    runOnce(spark, sfDir, agg = true, verbose = true, fbSink = true)
    dumpStages("Wfb")
    label("W again (memory sink)")
    runOnce(spark, sfDir, agg = true, verbose = true)
    dumpStages("W2")
    label("P checksum off")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    runOnce(spark, sfDir, agg = false, verbose = true)
    dumpStages("Pnc")
    label("W checksum off")
    runOnce(spark, sfDir, agg = true, verbose = true)
    dumpStages("Wnc")
    label("W checksum off (2)")
    runOnce(spark, sfDir, agg = true, verbose = true)
    dumpStages("Wnc2")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.stop()
  }

  private def runOnce(spark: SparkSession, sfDir: String, agg: Boolean,
      verbose: Boolean, fbSink: Boolean = false): Unit = {
    val out = "sp_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val t0 = System.nanoTime()
    val src = spark.readStream.format(graft.GraftEventLog.Format)
      .option("path", s"$sfDir/events.parquet").option("partitions", "4")
      .option("maxEventsPerTrigger", "4000").load()
    val plan = if (agg)
      src.withWatermark("enqueuedTime", "10 seconds")
        .groupBy(window(col("enqueuedTime"), "5 seconds"))
        .agg(count(lit(1)).as("n"))
    else src.select(col("sequenceNumber"))
    val q = (if (fbSink)
      plan.writeStream.queryName(out).outputMode("append")
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
          { df.count(); () })
    else plan.writeStream.format("memory").queryName(out).outputMode("append"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(600000)
    val sec = (System.nanoTime() - t0) / 1e9
    if (verbose) {
      println(s"=== agg=$agg total=${"%.2f".format(sec)}s batches=${q.recentProgress.length}")
      val keys = q.recentProgress.flatMap(_.durationMs.keySet().toArray().map(_.toString)).distinct.sorted
      val sums = keys.map { k =>
        k -> q.recentProgress.map(p => Option(p.durationMs.get(k)).map(_.longValue()).getOrElse(0L)).sum
      }
      println("  durationMs totals: " + sums.map { case (k, v) => s"$k=$v" }.mkString(" "))
      val so = q.recentProgress.flatMap(_.stateOperators)
      if (so.nonEmpty) {
        def tot(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long) = so.map(f).sum
        println(s"  state: commitMs=${tot(_.commitTimeMs)} rowsUpdated=${tot(_.numRowsUpdated)} " +
          s"rowsRemoved=${tot(_.numRowsRemoved)} rowsTotal=${so.last.numRowsTotal}")
      }
      val last3 = q.recentProgress.takeRight(3)
      last3.foreach(p => println(s"  batch ${p.batchId}: rows=${p.numInputRows} " +
        s"durations=${p.durationMs}"))
      q.recentProgress.foreach { p =>
        p.stateOperators.foreach { s =>
          println(s"  b${p.batchId} commit=${s.commitTimeMs} upd=${s.allUpdatesTimeMs} " +
            s"rm=${s.allRemovalsTimeMs} rowsUpd=${s.numRowsUpdated} mem=${s.memoryUsedBytes}")
        }
      }
    }
  }
}
