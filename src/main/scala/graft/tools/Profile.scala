package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Ad-hoc stage profiler for the dedup hot path. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)")
    }
    val docs = Tables.documents(spark, sfDir)
    time("docs count")(docs.count())
    val sh = docs.select(col("doc_id"),
      array_distinct(TextFunctions.wordShingles(col("text"), 3)).as("sh"))
    time("shingles compute")(sh.agg(sum(size(col("sh")))).head())
    val e = sh.filter(size(col("sh")) > 0)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
    time("exploded index")(e.count())
    val a = e.as("a"); val b = e.as("b")
    val joined = a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
    time("self-join count")(joined.count())
    val pairs = joined.groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("shared"))
    time("pair agg")(pairs.count())
    time("full query")(graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    time("simhash full")(graft.operators.Dedup.simHashPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
