package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Diagnostic: decompose q_dedup_clusters cost — pair generation vs label
  * propagation rounds (time per maxIterations step + convergence point). */
object ClustersProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val docs = graft.Tables.documents(spark, sfDir)
    // warmup
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()

    val (pairCount, tPairs) = time {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    println(f"pairs: $pairCount rows in $tPairs%.2fs")
    val converged = Dedup.clusters(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    for (k <- 1 to 4) {
      val (res, t) = time {
        Dedup.clusters(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5),
          maxIterations = k)
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      }
      println(f"maxIter=$k: total $t%.2fs converged=${res == converged}")
    }
    spark.stop()
  }
}
