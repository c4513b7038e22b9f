package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CountMinExprs.{cm_agg, cm_estimate}
import graft.functions.GraftFunctions

/** Exact heavy hitters without shuffling the long tail.
  *
  * `GROUP BY key HAVING count >= T` at 100 TB shuffles a partial
  * count for EVERY distinct key — billions of rows of shuffle for an
  * answer that names a few thousand. Here a Count-Min sketch pass
  * (map-side mergeable; one depth×width grid per map task crosses the
  * wire) finds candidate keys whose estimate clears T, and the exact
  * count runs over candidates only. CM never undercounts, so the
  * candidate set is a superset of the true heavy keys and the final
  * `HAVING` filter makes the result EXACT — byte-identical to the
  * full GROUP BY, which is what the gate oracle checks.
  *
  * Sizing: over-threshold noise is ≈ rowCount/width per key; keep
  * width ≫ rowCount/T so the candidate superset stays near-minimal
  * (false candidates cost exact-count work, never correctness).
  */
object HeavyHitters {

  /** Keys of `df` occurring at least `minCount` times, with exact
    * counts: (keyCol, n_rows). */
  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      minCount: Long,
      depth: Int = 4,
      width: Int = 16384): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val sketch = df
      .agg(cm_agg(xxhash64(col(keyCol)), depth, width).as("__graft_cm"))
      .head().getAs[Array[Byte]]("__graft_cm")
    df.filter(
        cm_estimate(lit(sketch), xxhash64(col(keyCol)), depth, width)
          >= minCount)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= minCount)
  }
}
