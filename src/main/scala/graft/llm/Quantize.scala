package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage/bandwidth scale path for
  * vector columns. A 100 TB corpus's float32 embeddings are 4 bytes
  * per dimension; symmetric int8 cuts that 4× (plus one float scale
  * per vector) at a bounded reconstruction error of `scale/2` per
  * element, which is what makes billion-vector ANN shippable.
  *
  * Everything here is per-row column algebra over the array — higher-
  * order functions (`transform`/`aggregate`/`array_max`), zero UDFs,
  * zero shuffles; the plan fuses into whatever scan precedes it.
  */
object Quantize {

  private def asDouble(vecCol: String): Column =
    transform(col(vecCol), x => x.cast("double"))

  /** Symmetric per-vector int8 quantization: `scale = max|x| / 127`,
    * `q_i = round(x_i / scale)` (ties away from zero) — so
    * `|q_i| ≤ 127` by construction and dequantization is `q_i·scale`.
    * An all-zero vector gets `scale = 0` and `q = 0⃗` (guarded — no
    * 0/0). Output: input columns minus `vecCol`, plus
    * `(scale, q: array<tinyint>)`. */
  def int8Quantize(
      embs: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val pass = embs.columns.filterNot(_ == vecCol).map(col).toSeq
    embs
      .select(pass :+ asDouble(vecCol).as("__graft_v"): _*)
      .withColumn("__graft_maxabs",
        array_max(transform(col("__graft_v"), x => abs(x))))
      .withColumn("scale", col("__graft_maxabs") / lit(127.0))
      .withColumn("__graft_ss",
        when(col("__graft_maxabs") === 0.0, lit(1.0))
          .otherwise(col("scale")))
      .withColumn("q",
        transform(col("__graft_v"),
          x => round(x / col("__graft_ss")).cast("byte")))
      .drop("__graft_v", "__graft_maxabs", "__graft_ss")
  }

  /** Dequantized vectors `(…pass-through…, dv: array<double>)` —
    * `dv_i = round(x_i/scale)·scale`, the values an int8-backed ANN
    * store actually searches over. Computed directly from the floats
    * (bit-identical to a byte round-trip, since `|q_i| ≤ 127` never
    * clamps) so the plan stays one narrow projection. */
  def int8Dequantize(
      embs: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val pass = embs.columns.filterNot(_ == vecCol).map(col).toSeq
    embs
      .select(pass :+ asDouble(vecCol).as("__graft_v"): _*)
      .withColumn("__graft_maxabs",
        array_max(transform(col("__graft_v"), x => abs(x))))
      .withColumn("__graft_ss",
        when(col("__graft_maxabs") === 0.0, lit(1.0))
          .otherwise(col("__graft_maxabs") / lit(127.0)))
      .withColumn("dv",
        transform(col("__graft_v"),
          x => round(x / col("__graft_ss")) * col("__graft_ss")))
      .drop("__graft_v", "__graft_maxabs", "__graft_ss")
  }

  /** Per-vector reconstruction-error profile:
    * `(idCol, scale, max_abs_err, mse)` — the audit a pipeline runs
    * before committing to quantized storage. `max_abs_err ≤ scale/2`
    * by construction (pinned in QuantizeSpec); rounding (9/12
    * decimals) absorbs last-ulp float noise, not signal. */
  def int8Profile(
      embs: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    embs
      .select(col(idCol), asDouble(vecCol).as("__graft_v"))
      .withColumn("__graft_maxabs",
        array_max(transform(col("__graft_v"), x => abs(x))))
      .withColumn("__graft_scale", col("__graft_maxabs") / lit(127.0))
      .withColumn("__graft_ss",
        when(col("__graft_maxabs") === 0.0, lit(1.0))
          .otherwise(col("__graft_scale")))
      .withColumn("__graft_errs",
        transform(col("__graft_v"),
          x => abs(x - round(x / col("__graft_ss")) * col("__graft_ss"))))
      .select(
        col(idCol),
        round(col("__graft_scale"), 9).as("scale"),
        round(array_max(col("__graft_errs")), 9).as("max_abs_err"),
        round(
          aggregate(col("__graft_errs"), lit(0.0), (a, e) => a + e * e) /
            size(col("__graft_v")).cast("double"), 12).as("mse"))
}
