package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Diagnostic: run gates with a listener that attributes wall time to
  * jobs/stages — exposes driver-side job churn (index builds, ML fits,
  * scalar collects) that per-gate wall time alone hides.
  * `runMain graft.tools.GateProfile <gate> [passes]` */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val passes = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.streaming.checkpointLocation", "/dev/shm/graft_gp_ckpt")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.streaming.LocalCheckpointFileManager")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.addShutdownHook {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File("/dev/shm/graft_gp_ckpt"))
    }

    final case class JobRec(id: Int, var start: Long = 0L, var end: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0L,
      var desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId, start = e.time)
        r.desc = Option(e.properties.getProperty("spark.job.description"))
          .orElse(Option(e.properties.getProperty("callSite.short")))
          .getOrElse("")
        jobs.put(e.jobId, r)
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val j = stageToJob.get(e.stageInfo.stageId)
        val r = if (j != null) jobs.get(j) else null
        if (r != null) {
          r.stages += 1; r.tasks += e.stageInfo.numTasks
          r.taskMs += e.stageInfo.taskMetrics.executorRunTime
        }
      }
    })

    for (name <- names) {
      for (p <- 1 to passes) {
        spark.catalog.clearCache()
        jobs.clear(); stageToJob.clear()
        val t0 = System.nanoTime()
        val c = graft.SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let listener drain
        import scala.jdk.CollectionConverters._
        val js = jobs.values.asScala.toSeq.sortBy(_.start)
        val jobWall = js.map(j => math.max(j.end - j.start, 0L)).sum
        println(f"GATEPROF $name pass $p: wall=$wall%.2fs rows=$c jobs=${js.size} " +
          f"jobWallSum=${jobWall}ms outsideJobs=${math.max(wall * 1000 - jobWall, 0).toInt}ms")
        if (p == passes) {
          js.sortBy(j => -(j.end - j.start)).take(14).foreach { j =>
            println(f"  job ${j.id}%3d wall=${j.end - j.start}%5dms stages=${j.stages} " +
              f"tasks=${j.tasks}%4d taskMs=${j.taskMs}%6d  ${j.desc.take(90)}")
          }
        }
      }
    }
    spark.stop()
  }
}
