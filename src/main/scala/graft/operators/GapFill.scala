package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series gap-fill: materialize a fixed-step grid per key and
  * forward-fill the last observation onto every grid point — the
  * resample/upsample primitive (monitoring dashboards, feature
  * snapshots at training time, uniform inputs for sequence models).
  *
  * Built by composition: `sequence()` generates each key's grid
  * driver-free (one narrow Generate — the grid never ships to the
  * driver), and [[AsofJoin]] attaches the last value at-or-before each
  * grid instant (union+window — no join explosion). Total cost: two
  * keyed exchanges (the per-key bounds aggregate, then the as-of
  * window) plus the Generate; both shuffle the same key, and the agg
  * side carries only (key, t0, t1).
  */
object GapFill {

  /** Per-key grid from each key's own min to max ts, stepped by
    * `stepSeconds`, with the observation value forward-filled.
    *
    * Output: (keyCol, grid_ts, <valueCol>). The grid anchors at the
    * min ts aligned DOWN to the step, so the first grid point can
    * precede the first observation by up to step−1 seconds — its value
    * is then NULL (nothing to fill from yet). Every later grid point
    * is non-NULL. */
  def forwardFill(
      obs: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive: $stepSeconds")
    // 1. per-key grid bounds, aligned DOWN to the step so grid points
    // are step-multiples of the epoch (deterministic, join-stable)
    val step = lit(stepSeconds)
    // integer align (subtract/add the modulus): long/long would plan a
    // double divide — exact here, but the integral form can't regress.
    // Start aligns DOWN, end aligns UP: the last grid point is ≥ the
    // key's max observation, so every key's final state appears even
    // when it has a single observation.
    def alignDown(c: org.apache.spark.sql.Column) = {
      val s = c.cast("long")
      timestamp_seconds(s - pmod(s, step))
    }
    def alignUp(c: org.apache.spark.sql.Column) = {
      val s = c.cast("long")
      timestamp_seconds(s + pmod(step - pmod(s, step), step))
    }
    val grid = obs
      .groupBy(col(keyCol))
      .agg(alignDown(min(col(tsCol))).as("__t0"),
        alignUp(max(col(tsCol))).as("__t1"))
      .select(col(keyCol),
        explode(sequence(col("__t0"), col("__t1"),
          expr(s"INTERVAL $stepSeconds SECONDS"))).as("grid_ts"))
    // 2. last observation at-or-before each grid point (forward fill)
    AsofJoin.asofJoin(
      grid, keyCol, "grid_ts",
      obs.select(col(keyCol), col(tsCol), col(valueCol)),
      keyCol, tsCol, Seq(valueCol))
  }
}
