package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ThetaExprs

/** Incremental set-overlap via persisted theta sketch tables — the
  * fourth sketch-table member ([[DistinctSketches]] HLL counts,
  * [[HistogramSketch]] fixed-domain quantiles, [[QuantileSketches]]
  * KLL rank quantiles): theta sketches support INTERSECTION, so the
  * per-bucket table answers retention/overlap questions ("how many
  * of range A's users were also active in range B") from ~KB sketch
  * rows. Build/maintenance contract identical to the siblings:
  * map-side-partial per-bucket build, append new buckets, range
  * queries merge sketches. Exact below the retained-entry budget
  * (~16k at lgK=14), tolerance-audited beyond.
  */
object ThetaSketches {

  /** One theta sketch of `keyCol` (long) per `bucketCol` value. */
  def sketchPerBucket(
      df: DataFrame,
      bucketCol: String,
      keyCol: String): DataFrame = {
    ThetaExprs.register(df.sparkSession)
    df.filter(col(keyCol).isNotNull)
      .groupBy(col(bucketCol).as("bucket"))
      .agg(ThetaExprs.theta_sketch_agg(col(keyCol).cast("long"))
        .as("sketch"))
  }

  /** Materialize the sketch table (append new buckets with mode
    * Append and a bucket filter upstream). */
  def writeSketchTable(
      df: DataFrame,
      bucketCol: String,
      keyCol: String,
      outPath: String,
      mode: String = "overwrite"): Unit =
    sketchPerBucket(df, bucketCol, keyCol)
      .write.mode(mode).parquet(outPath)

  /** Estimated |keys(predA) ∩ keys(predB)| from sketch rows alone:
    * union each side's bucket sketches, intersect the two results.
    * One row out. */
  def overlapEstimate(
      sketches: DataFrame,
      predA: Column,
      predB: Column): DataFrame = {
    ThetaExprs.register(sketches.sparkSession)
    val a = sketches.filter(predA)
      .agg(ThetaExprs.theta_union_agg(col("sketch")).as("ua"))
    val b = sketches.filter(predB)
      .agg(ThetaExprs.theta_union_agg(col("sketch")).as("ub"))
    a.crossJoin(broadcast(b))
      .select(ThetaExprs.theta_intersect_estimate(col("ua"), col("ub"))
        .as("overlap_est"))
  }

  /** [[overlapEstimate]] straight from a persisted sketch table. */
  def overlapFromTable(
      spark: SparkSession,
      sketchPath: String,
      predA: Column,
      predB: Column): DataFrame =
    overlapEstimate(spark.read.parquet(sketchPath), predA, predB)
}
