package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: time one gate query N times at a given sf dir. */
object TimeGate {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.checkpointLocation", "/dev/shm/graft_tg_ckpt")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.streaming.LocalCheckpointFileManager")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.addShutdownHook {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File("/dev/shm/graft_tg_ckpt"))
    }
    for (i <- 1 to n) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMEGATE $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    spark.stop()
  }
}
