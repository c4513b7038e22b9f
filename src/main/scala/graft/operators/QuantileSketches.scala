package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.KllExprs

/** Incremental range quantiles via persisted KLL sketch tables — the
  * third member of the sketch-table family:
  *
  *  - [[DistinctSketches]] (HLL): distinct counts;
  *  - [[HistogramSketch]]: quantiles with a ONE-BIN VALUE-error bound,
  *    but the [lo, hi) domain must be fixed a priori;
  *  - this (KLL): quantiles with a normalized RANK-error guarantee
  *    (~1.65% at k=200) and NO domain assumption — the right tool
  *    when the value range is unknown or unbounded (latencies,
  *    balances, token counts of an uncurated crawl).
  *
  * Same lifecycle as the other two: one ~KB sketch per bucket,
  * built map-side partial (KLL merge is associative/commutative),
  * appended per new bucket without touching history; a range
  * quantile merges the overlapping bucket sketches — metadata-sized
  * input, never a raw rescan.
  *
  * Estimates are rank-contract-stable but not bit-stable (KLL
  * compaction randomizes), so audits pin tolerance booleans
  * ([[graft.queries.ProfileQueries]]'s a23), like the HLL table's
  * a21 — never raw estimates.
  */
object QuantileSketches {

  /** One KLL sketch of `valueCol` per distinct `bucketCol` value. */
  def sketchPerBucket(
      df: DataFrame,
      bucketCol: String,
      valueCol: String): DataFrame = {
    KllExprs.register(df.sparkSession)
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(bucketCol).as("bucket"))
      .agg(KllExprs.kll_sketch_agg(col(valueCol).cast("double"))
        .as("sketch"))
  }

  /** Materialize the sketch table (append new buckets with mode
    * Append and a bucket filter upstream). */
  def writeSketchTable(
      df: DataFrame,
      bucketCol: String,
      valueCol: String,
      outPath: String,
      mode: String = "overwrite"): Unit =
    sketchPerBucket(df, bucketCol, valueCol)
      .write.mode(mode).parquet(outPath)

  /** Quantile estimates at `qs` over (already bucket-filtered) sketch
    * rows: `(q, est)` — one merged sketch, one row per rank. */
  def rangeQuantiles(sketches: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"ranks must be in [0,1]: $qs")
    KllExprs.register(sketches.sparkSession)
    sketches
      .agg(KllExprs.kll_merge_agg(col("sketch")).as("merged"))
      .select(
        explode(array(qs.map(lit(_)): _*)).as("q"),
        col("merged"))
      .select(col("q"), KllExprs.kll_quantile(col("merged"), col("q")).as("est"))
  }

  /** Range quantiles straight from a persisted sketch table. */
  def rangeQuantilesFromTable(
      spark: SparkSession,
      sketchPath: String,
      pred: org.apache.spark.sql.Column,
      qs: Seq[Double]): DataFrame =
    rangeQuantiles(spark.read.parquet(sketchPath).filter(pred), qs)
}
