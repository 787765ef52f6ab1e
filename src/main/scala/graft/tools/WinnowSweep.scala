package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.Dedup

object WinnowSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    for (ngram <- Seq(12, 16, 24); window <- Seq(8); minShared <- Seq(3, 5, 10)) {
      val n = Dedup.fingerprintPairs(docs, "doc_id", "text", ngram, window, minShared).count()
      println(s"ngram=$ngram window=$window minShared=$minShared -> $n pairs")
    }
    spark.stop()
  }
}
