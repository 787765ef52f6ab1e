package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Multi-JVM proof that slow-partition throttling (ref R3) works WITHOUT the
 * shared-JVM registry: `local-cluster[2,1,1024]` launches executors as
 * SEPARATE processes, so reader-side `PartitionThrottler.record` calls land
 * in executor JVMs the driver never sees — only the ReceiveSample
 * accumulator transport (the stand-in for the reference's
 * PartitionPerformanceReceiver RpcEndpoint,
 * PartitionPerformanceReceiver.scala:27-71) can move the driver's factors.
 *
 * One partition is made slow with a per-row sleep DOWNSTREAM of the scan —
 * the reader's elapsed covers its task's whole pull loop, so consumer-side
 * latency inflates that partition's measured receive time exactly as a slow
 * broker link would. Prints `CLUSTER THROTTLE OK factors=...` when the slow
 * partition's factor dropped below 1 while every healthy partition stayed
 * at 1 (ThrottlerSpec asserts on that line from a subprocess).
 */
object ClusterThrottleCheck {
  /** JDK 17 module opens Spark needs outside spark-submit — the executor
    * processes need them too (mirrors build.sbt's list). */
  val JdkAddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  def main(args: Array[String]): Unit = {
    // the worker's executor launcher resolves the Spark distribution from
    // SPARK_HOME / spark.test.home; point it at the image's install
    if (System.getenv("SPARK_HOME") == null)
      System.setProperty("spark.test.home", "/opt/spark")
    // spark.* system properties are rejected in executor extraJavaOptions
    val execOpts = JdkAddOpens.mkString(" ")
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName("graft-cluster-throttle-check")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.executor.extraJavaOptions", execOpts)
      .getOrCreate()
    try {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-cluster-thr").toString
      val root = s"$base/log"
      // seed a durable log (file-backed — the only backend a multi-JVM
      // executor can read; the in-memory registry is per-process)
      spark.range(4L * 3000L).select(
          concat(lit("e"), col("id")).as("body"),
          (col("id") % 4).cast("string").as("partition"))
        .write.mode("append").format("graft-eventlog")
        .option("durablePath", root).option("partitions", "4").save()

      val slowPerRow = udf { (p: String) =>
        if (p == "0") Thread.sleep(3L)
        1
      }
      val conf = graft.sources.EventLogConf(Map(
        "durablepath" -> root, "partitions" -> "4"))
      graft.sources.PartitionThrottler.drop(conf.throttlerKey) // fresh tracker
      val q = spark.readStream.format("graft-eventlog")
        .option("durablePath", root).option("partitions", "4")
        .option("slowPartitionAdjustment", "true")
        .option("maxAcceptableBatchReceiveTime", "1")
        .option("maxEventsPerTrigger", "400")
        .load()
        .select(slowPerRow(col("partition")).as("x"))
        .writeStream.format("noop")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(240000)
      q.stop()

      val f = graft.sources.PartitionThrottler
        .forLog(conf.throttlerKey, conf.maxAcceptableBatchReceiveTimeMs).factors
      val factors = (0 until 4).map(p => p -> f(p)).toMap
      val ok = factors(0) < 0.9 && (1 until 4).forall(p => factors(p) == 1.0)
      // scalastyle:off println
      if (ok) println(s"CLUSTER THROTTLE OK factors=$factors")
      else println(s"CLUSTER THROTTLE FAILED factors=$factors")
      // scalastyle:on println
      if (!ok) sys.exit(1)
    } finally spark.stop()
  }
}
