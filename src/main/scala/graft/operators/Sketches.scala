package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sketch-based approximate aggregates for corpus-scale profiling, where the
 * sketch (not the raw values) is the mergeable shuffle payload:
 *
 *  - HLL distinct counts: `hll_sketch_agg` partials merge associatively, so
 *    a 100 TB distinct-count is one map-side-combined aggregation with
 *    KB-sized partial state per group, and sketches persisted per shard can
 *    be re-merged later (`mergeDistinctSketches`) without touching the data.
 *  - approx quantiles via `percentile_approx` for numeric profiling.
 *
 * Spark 4 ships the Apache DataSketches HLL family as native functions —
 * used directly (codegen'd + mergeable) rather than re-implementing.
 */
object Sketches {

  /** Per-group approximate distinct count of `of` with persistable sketches:
    * returns (groupCols..., n_approx, sketch BINARY). */
  def distinctSketch(df: DataFrame, groupCols: Seq[Column], of: Column,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(hll_sketch_agg(of, lit(lgConfigK)).as("sketch"))
      .withColumn("n_approx", hll_sketch_estimate(col("sketch")).cast("long"))

  /** Merge previously computed group sketches into one global estimate —
    * the re-aggregation path that never rescans the data. */
  def mergeDistinctSketches(sketches: DataFrame, sketchCol: String = "sketch"): Long =
    sketches.agg(
        hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false))).cast("long"))
      .head().getLong(0)

  /** Numeric profile per group: approximate quantiles + exact min/max/avg.
    * `n` is the NON-NULL value count — the population every other field
    * describes (avg/min/max/percentile_approx all skip nulls), and the
    * population rank-bound checks must be computed against: a count(*)
    * n would misplace the guaranteed rank window [(p-eps)n, (p+eps)n]
    * whenever the column contains nulls. */
  def numericProfile(df: DataFrame, groupCols: Seq[Column], value: Column,
      quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(
        count(value).as("n"),
        round(avg(value), 4).as("avg"),
        min(value).as("min"),
        max(value).as("max"),
        percentile_approx(value, array(quantiles.map(lit): _*), lit(10000))
          .as("quantiles"))

  /**
   * Mergeable approximate term-frequency sketch (Count-Min): one pass over
   * the exploded words builds a KB-sized CMS per group; estimates are read
   * driver-side without rescanning. The CMS guarantee is one-sided —
   * estimate >= true count, overshoot bounded by eps * totalTerms with
   * probability `confidence` — which is exactly what stop-word thresholds
   * and df-cap tuning need at corpus scale. Spark's native `count_min_sketch`
   * aggregate supplies mergeable partials (map-side combine, same shape as
   * the HLL path above).
   */
  /** Default CMS relative-error bound — shared with the correctness gate's
    * `exact <= est <= exact + eps*N` assertion so the two cannot drift. */
  val DefaultCmsEps: Double = 0.0001

  def termFrequencySketch(
      docs: DataFrame, textCol: String,
      eps: Double = DefaultCmsEps, confidence: Double = 0.99, seed: Int = 42): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .agg(count_min_sketch(col("term"), lit(eps), lit(confidence), lit(seed))
        .as("cms"))

  /** Driver-side point queries against a serialized CMS. */
  def estimateTermCounts(cmsBytes: Array[Byte], terms: Seq[String]): Map[String, Long] = {
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(cmsBytes))
    terms.map(t => t -> cms.estimateCount(t)).toMap
  }

  /** Exact numeric profile per group: count/avg/stddev plus exact
    * linear-interpolated percentiles (`percentile`, the sort-based exact
    * aggregate — the small-group / verification counterpart of
    * `numericProfile`; identical semantics to DuckDB `quantile_cont`). */
  def numericProfileExact(df: DataFrame, groupCols: Seq[Column], value: Column,
      quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    val qCols = quantiles.map(q =>
      round(percentile(value, lit(q)), 4).as(s"p${(q * 100).round}"))
    val aggs = Seq(
      count(lit(1)).as("n"),
      round(avg(value), 4).as("avg"),
      round(stddev_samp(value), 4).as("sd")) ++ qCols ++ Seq(
      round(min(value), 4).as("min"),
      round(max(value), 4).as("max"))
    df.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)
  }
}
