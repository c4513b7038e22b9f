package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental set-overlap via persisted theta sketch tables — the
  * fourth sketch-table member ([[DistinctSketches]] HLL counts,
  * [[HistogramSketch]] fixed-domain quantiles, [[QuantileSketches]]
  * KLL rank quantiles): theta sketches support INTERSECTION, so the
  * per-bucket table answers retention/overlap questions ("how many
  * of range A's users were also active in range B") from ~KB sketch
  * rows — the query the HLL table cannot answer.
  *
  * Built on Spark 4's native DataSketches theta functions
  * (`theta_sketch_agg` / `theta_union_agg` / `theta_intersection` /
  * `theta_sketch_estimate` — Catalyst aggregates and expressions, not
  * UDFs). Build/maintenance contract identical to the siblings:
  * map-side-partial per-bucket build, append new buckets, range
  * queries merge sketches. Exact below the retained-entry budget
  * (~16k at lgK=14), ~0.8% RSE beyond — so audits use tolerance
  * oracles (the a21 pattern).
  */
object ThetaSketches {

  /** lgK=14: exact to ~16k distinct per sketch, ~0.8% RSE beyond. */
  val DefaultLgK = 14

  /** One theta sketch of `keyCol` per `bucketCol` value. */
  def sketchPerBucket(
      df: DataFrame,
      bucketCol: String,
      keyCol: String): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .groupBy(col(bucketCol).as("bucket"))
      .agg(call_function("theta_sketch_agg",
        col(keyCol).cast("long"), lit(DefaultLgK)).as("sketch"))

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
    * One row out, `overlap_est` double. */
  def overlapEstimate(
      sketches: DataFrame,
      predA: Column,
      predB: Column): DataFrame = {
    val a = sketches.filter(predA)
      .agg(call_function("theta_union_agg",
        col("sketch"), lit(DefaultLgK)).as("ua"))
    val b = sketches.filter(predB)
      .agg(call_function("theta_union_agg",
        col("sketch"), lit(DefaultLgK)).as("ub"))
    a.crossJoin(broadcast(b))
      .select(call_function("theta_sketch_estimate",
        call_function("theta_intersection", col("ua"), col("ub")))
        .cast("double").as("overlap_est"))
  }

  /** [[overlapEstimate]] straight from a persisted sketch table. */
  def overlapFromTable(
      spark: SparkSession,
      sketchPath: String,
      predA: Column,
      predB: Column): DataFrame =
    overlapEstimate(spark.read.parquet(sketchPath), predA, predB)
}
