package graft.tools

import org.apache.spark.sql.SparkSession

/** Time named SparkEntry queries (warm + best-of-3) outside the full bench:
  * `runMain graft.tools.QueryTimer q_a q_b ...` against SPARK_GRAFT_SF_DIR. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.streaming.LocalCheckpointFileManager")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      val q = graft.SparkEntry.queries(name)
      q(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: best=${times.min}%.3fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
