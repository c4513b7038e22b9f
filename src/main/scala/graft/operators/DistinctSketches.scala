package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental distinct counting via persisted HLL sketch tables
  * (Apache DataSketches, built into Spark 4 as
  * `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`).
  *
  * `COUNT(DISTINCT key)` over an arbitrary time range rescans every
  * raw row in the range — at 100 TB that is the query you cannot
  * afford to run twice. The sketch table materializes one HLL sketch
  * per bucket (e.g. per day): ~1-2 KB per bucket regardless of row
  * count. Any range query is then a union of the overlapping bucket
  * sketches — metadata-sized input, never a raw rescan — and new days
  * append as new bucket rows without touching history (sketch merge
  * is associative/commutative, the same property that makes the
  * per-bucket build map-side partial).
  *
  * Accuracy is the sketch's (~2% at default lgK); exactness-critical
  * paths keep `countDistinct`. The engine's tolerance-style oracle
  * (`hll_range_distinct`) pins the estimate against the exact count
  * recomputed by DuckDB.
  */
object DistinctSketches {

  /** One HLL sketch of `keyCol` per distinct `bucketCol` value. */
  def sketchPerBucket(
      df: DataFrame,
      bucketCol: String,
      keyCol: String): DataFrame =
    df.groupBy(col(bucketCol).as("bucket"))
      .agg(expr(s"hll_sketch_agg($keyCol)").as("sketch"))

  /** Materialize the sketch table (append-friendly: re-run for new
    * buckets with mode Append and a bucket filter upstream). */
  def writeSketchTable(
      df: DataFrame,
      bucketCol: String,
      keyCol: String,
      outPath: String,
      mode: String = "overwrite"): Unit =
    sketchPerBucket(df, bucketCol, keyCol)
      .write.mode(mode).parquet(outPath)

  /** Estimated distinct keys across the buckets selected by `pred`,
    * from the sketch table alone (no raw-data scan). */
  def estimateRange(
      spark: SparkSession,
      sketchPath: String,
      pred: org.apache.spark.sql.Column): Long =
    spark.read.parquet(sketchPath)
      .filter(pred)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("est"))
      .head().getLong(0)
}
