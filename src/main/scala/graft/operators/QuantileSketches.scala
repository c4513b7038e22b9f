package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * Built on Spark 4's native DataSketches KLL functions
  * (`kll_sketch_agg_double` / `kll_merge_agg_double` /
  * `kll_sketch_get_quantile_double` — Catalyst aggregates, not UDFs,
  * so the per-bucket build is map-side partial with the live sketch
  * object per group and only the compact image crossing the
  * exchange), exactly as [[DistinctSketches]] builds on the native
  * HLL functions.
  *
  * Lifecycle: one ~KB sketch per bucket, appended per new bucket
  * without touching history (KLL merge is associative/commutative);
  * a range quantile merges the overlapping bucket sketches —
  * metadata-sized input, never a raw rescan.
  *
  * Estimates are rank-contract-stable but not bit-stable (KLL
  * compaction randomizes), so audits pin tolerance booleans
  * ([[graft.queries.ProfileQueries]]'s a23), like the HLL table's
  * a21 — never raw estimates.
  */
object QuantileSketches {

  /** Sketch accuracy parameter: ε ≈ 1.65% normalized rank error. */
  val DefaultK = 200

  /** One KLL sketch of `valueCol` per distinct `bucketCol` value. */
  def sketchPerBucket(
      df: DataFrame,
      bucketCol: String,
      valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(bucketCol).as("bucket"))
      .agg(call_function("kll_sketch_agg_double",
        col(valueCol).cast("double"), lit(DefaultK)).as("sketch"))

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
    * rows: `(q, est)` — one merged sketch, one row per rank. An empty
    * bucket selection yields NULL estimates. */
  def rangeQuantiles(sketches: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"ranks must be in [0,1]: $qs")
    // the native extractor requires a FOLDABLE rank, so each q gets
    // its own literal call; the struct array then explodes to rows.
    // An empty bucket selection merges to an EMPTY sketch whose
    // quantile call raises — probe n first and emit NULL instead.
    sketches
      .agg(call_function("kll_merge_agg_double",
        col("sketch"), lit(DefaultK)).as("merged"))
      .select(explode(array(qs.map(q =>
        struct(
          lit(q).as("q"),
          when(col("merged").isNull ||
              call_function("kll_sketch_get_n_double", col("merged")) === 0,
            lit(null).cast("double"))
            .otherwise(call_function("kll_sketch_get_quantile_double",
              col("merged"), lit(q))).as("est"))): _*)).as("r"))
      .select(col("r.q").as("q"), col("r.est").as("est"))
  }

  /** Range quantiles straight from a persisted sketch table. */
  def rangeQuantilesFromTable(
      spark: SparkSession,
      sketchPath: String,
      pred: org.apache.spark.sql.Column,
      qs: Seq[Double]): DataFrame =
    rangeQuantiles(spark.read.parquet(sketchPath).filter(pred), qs)
}
