package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-budget sequence packing: cut a corpus into training shards of
  * ~`budgetTokens` tokens by the standard concatenate-then-split rule —
  * a document belongs to the shard where its token offset starts.
  *
  * The reference pipeline stops at per-document storage; packing is the
  * step a pre-training data pipeline runs last, and it is deliberately
  * NOT `rand()`-based: shard membership is a pure function of
  * (source, doc_id), so re-processing the corpus can never move a
  * document between shards (the same determinism argument as
  * [[Sampling.assignSplit]]).
  *
  * Scale: a true global concatenation needs a total order — inherently
  * sequential. Real pipelines therefore pack within independent units;
  * here the unit is (source, doc_id mod `buckets`), so `sources ×
  * buckets` workers pack in parallel and `buckets` scales the
  * parallelism. The plan is one shuffle on the unit key plus an
  * in-partition sort — the minimum any deterministic packing can do —
  * and the cumulative sum is a window with map-side-prunable
  * projection, not a driver loop.
  */
object Packing {

  /** Per-document shard assignment: (doc_id, source, bucket, n_tokens,
    * start_tok, shard_seq). `start_tok` is the document's starting
    * token offset within its pack unit; `shard_seq = start_tok div
    * budget` (exact integer division — no double rounding at 100 TB
    * offsets). */
  def packOffsets(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source",
      buckets: Int = 8,
      budgetTokens: Long = 2048L,
      extraCols: Seq[(String, Column)] = Nil): DataFrame = {
    require(buckets > 0 && budgetTokens > 0,
      s"buckets and budgetTokens must be positive: $buckets, $budgetTokens")
    val base = docs.select(Seq(
      col(idCol).as("doc_id"),
      col(sourceCol).as("source"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
      pmod(col(idCol), lit(buckets.toLong)).as("bucket")) ++
      extraCols.map { case (n, c) => c.as(n) }: _*)
    val w = Window.partitionBy("source", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("shard_seq", expr(s"start_tok div ${budgetTokens}L"))
  }

  /** Shard inventory: one row per (source, bucket, shard_seq) with doc
    * and token counts — the manifest a shard writer consumes. */
  def shardStats(
      docs: DataFrame,
      buckets: Int = 8,
      budgetTokens: Long = 2048L): DataFrame =
    packOffsets(docs, buckets = buckets, budgetTokens = budgetTokens)
      .groupBy("source", "bucket", "shard_seq")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"))
      .orderBy("source", "bucket", "shard_seq")

  /** Per-shard content fingerprint: each member doc's rolling text
    * hash ([[TextAnalysis.fingerprint]], bounded < 2³¹ so a shard's
    * sum never overflows a long), summed per shard —
    * order-independent, so any partitioning reproduces it
    * bit-for-bit. This is the shard-reproducibility audit: two
    * pipeline runs must emit identical `(shard, n_docs, shard_fp)`
    * rows before a training job trusts the export. One scan (the
    * fingerprint rides [[packOffsets]]'s projection via `extraCols`),
    * one window shuffle, map-side-combined final aggregate. */
  def shardDigests(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source",
      buckets: Int = 8,
      budgetTokens: Long = 2048L): DataFrame =
    packOffsets(docs, idCol, textCol, sourceCol, buckets, budgetTokens,
      extraCols = Seq("fp" -> TextAnalysis.fingerprint(col(textCol))))
      .groupBy("source", "bucket", "shard_seq")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("fp")).as("shard_fp"))
      .orderBy("source", "bucket", "shard_seq")

  /** Padding-waste profile for length-bucketed batching — the other
    * way training shards get built (pad every sequence in a batch to
    * the bucket's max) and the number that decides whether packing is
    * worth its shuffle: per power-of-two length bucket, document and
    * token counts and the fraction of padded positions wasted
    * (`1 − Σtokens / (n·bucket)`). Buckets are `2^⌈log2 n⌉` — exact
    * in double for any realistic length, so the same arithmetic runs
    * in the oracle. One map-side-combined aggregate over a narrow
    * projection; nothing else moves. */
  def paddingWaste(
      docs: DataFrame,
      textCol: String = "text"): DataFrame =
    docs
      .select(TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("bucket",
        pow(lit(2.0), ceil(log(2.0, greatest(col("n_tokens"), lit(1L)))))
          .cast("long"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("padded_positions", col("n_docs") * col("bucket"))
      .withColumn("waste_frac",
        round(lit(1.0) - col("sum_tokens").cast("double") /
          col("padded_positions").cast("double"), 4))
      .orderBy("bucket")
}
