package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextHash}

/** DSIR-style data selection via importance weighting over hashed
  * n-gram features (Xie et al., "Data Selection for Language Models
  * via Importance Resampling", NeurIPS 2023 — public method): score
  * every raw document by how much more likely its hashed-unigram
  * feature distribution is under a TARGET corpus (the data you want
  * more of — e.g. wiki/books) than under the RAW corpus it came from,
  * then keep the highest-scoring documents. This is the
  * distribution-matching selection step a pretraining pipeline runs
  * between crawling and training.
  *
  * Features are hash buckets, not a vocabulary: `feature(token) =
  * text_hash(token ‖ salt) mod numBuckets`. The model per corpus is
  * therefore a FIXED-SIZE array of bucket counts — ≤ `numBuckets`
  * rows by construction at ANY corpus size, so both models broadcast
  * and scoring is one narrow pass over the raw corpus (explode →
  * bucket → broadcast probe → per-doc aggregate). No fact-fact
  * shuffle anywhere; the only exchanges are the two bounded count
  * aggregates and the per-doc-keyed score aggregate.
  *
  * The per-document weight is the mean token log-ratio
  * `avg_t ln(p̂_target(f(t)) / p̂_raw(f(t)))` with add-1 smoothing
  * over the bucket space (`p̂(f) = (cnt(f)+1)/(N+B)`), the
  * length-normalized form of DSIR's log importance weight (mean
  * rather than sum so long documents aren't favored merely for
  * repeating on-target tokens).
  *
  * Determinism: counts and totals are exact integers; each token's
  * log-ratio is `ln` of a ratio of exact integers (one IEEE division
  * + one ln — bit-identical across engines); only the final per-doc
  * mean is order-exposed, handled by the same round-to-4 display
  * contract as `text_unigram_logprob`.
  */
object Importance {

  /** Hashed feature id of a token: salted rolling hash mod the bucket
    * count. The salt decorrelates the feature space from the id-hash
    * samplers and split buckets. */
  def featureId(token: Column, numBuckets: Int): Column =
    pmod(TextHash.text_hash(concat(token, lit("#dsir"))),
      lit(numBuckets.toLong))

  /** Per-bucket token counts of a corpus: ≤ `numBuckets` rows by
    * construction (broadcastable at any corpus size). One exploded
    * pass, map-side-combined aggregate. */
  def featureCounts(
      docs: DataFrame,
      numBuckets: Int,
      textCol: String = "text"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .select(explode(TextAnalysis.tokens(
        lower(coalesce(col(textCol), lit(""))))).as("token"))
      .groupBy(featureId(col("token"), numBuckets).as("feat"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The bounded importance MODEL: `(feat, log_ratio)` — ≤
    * `numBuckets` rows at any corpus size. Split out so a streaming
    * deployment can freeze it once at setup
    * ([[graft.streaming.Incremental.dsirStream]]) and score
    * micro-batches with a broadcast probe. */
  def importanceModel(
      raw: DataFrame,
      target: DataFrame,
      numBuckets: Int = 4096,
      textCol: String = "text"): DataFrame = {
    require(numBuckets >= 2 && numBuckets <= (1 << 24),
      s"numBuckets out of range: $numBuckets")
    GraftFunctions.register(raw.sparkSession)
    val tc = featureCounts(target, numBuckets, textCol)
      .withColumnRenamed("cnt", "cnt_t")
    val rc = featureCounts(raw, numBuckets, textCol)
      .withColumnRenamed("cnt", "cnt_r")
    // one (feat → cnt_t, cnt_r) frame; full-outer because a bucket
    // can be populated on either side only
    val model = tc.join(rc, Seq("feat"), "full_outer")
      .select(col("feat"),
        coalesce(col("cnt_t"), lit(0L)).as("cnt_t"),
        coalesce(col("cnt_r"), lit(0L)).as("cnt_r"))
    val totals = model.agg(
      sum(col("cnt_t")).as("n_t"),
      sum(col("cnt_r")).as("n_r"))
    val b = lit(numBuckets.toLong)
    model.crossJoin(broadcast(totals))
      .select(col("feat"),
        (log((col("cnt_t") + lit(1L)).cast("double") /
             (col("n_t") + b).cast("double")) -
         log((col("cnt_r") + lit(1L)).cast("double") /
             (col("n_r") + b).cast("double"))).as("log_ratio"))
  }

  /** Score documents against a precomputed [[importanceModel]]:
    * `(idCol, n_tokens, avg_log_ratio)`. One narrow pass (explode →
    * bucket → broadcast probe → per-doc aggregate); works unchanged
    * on a streaming frame (stream-static join + aggregate). */
  def scoreWithModel(
      docs: DataFrame,
      model: DataFrame,
      numBuckets: Int = 4096,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .select(
        col(idCol),
        explode(TextAnalysis.tokens(
          lower(coalesce(col(textCol), lit(""))))).as("token"))
      .select(col(idCol), featureId(col("token"), numBuckets).as("feat"))
      .join(broadcast(model), Seq("feat"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        // an unseen bucket cannot occur when the model was built over
        // these docs' own raw distribution, but keep the score
        // null-safe for frozen models scoring FRESH documents
        avg(coalesce(col("log_ratio"), lit(0.0))).as("avg_log_ratio"))
  }

  /** Per-document importance weights of the raw corpus against a
    * target corpus: `(idCol, n_tokens, avg_log_ratio)`. Higher =
    * more target-like. Both feature models are bounded aggregates
    * joined broadcast; the raw corpus is read once for its own model
    * and once for scoring (the minimum when the denominator
    * distribution is derived from the data itself). */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      numBuckets: Int = 4096,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    scoreWithModel(raw,
      importanceModel(raw, target, numBuckets, textCol),
      numBuckets, idCol, textCol)

  /** Threshold act step: keep every document whose mean log-ratio is
    * at least `minAvgLogRatio` — unlike [[importanceSelect]]'s top-n
    * (which needs a global rank) this is streamable: frozen model →
    * broadcast probe → narrow filter. */
  def importanceFilter(
      docs: DataFrame,
      model: DataFrame,
      minAvgLogRatio: Double,
      numBuckets: Int = 4096,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val keep = scoreWithModel(docs, model, numBuckets, idCol, textCol)
      .filter(round(col("avg_log_ratio"), 4) >= minAvgLogRatio)
      .select(col(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Frozen ROW-LOCAL scorer: collects the bounded model (≤
    * `numBuckets` rows — bounded by construction, so the collect is
    * model-sized, never corpus-sized) into ONE map literal and
    * returns a transformation that scores and threshold-filters any
    * frame as a stateless projection — no explode, no aggregation, no
    * shuffle, and therefore APPEND-SAFE on a stream
    * ([[graft.streaming.Incremental.dsirStream]] deploys it). The
    * per-doc score is `round(Σ lookup / n_tokens, 4)`, a left fold
    * over the token array; the threshold compares the rounded value
    * (integer decision surface, per the float-hashing contract).
    * Batch ≡ stream because the SAME returned body serves both. */
  def frozenScorer(
      raw: DataFrame,
      target: DataFrame,
      minAvgLogRatio: Double,
      numBuckets: Int = 4096,
      textCol: String = "text"): DataFrame => DataFrame = {
    val rows = importanceModel(raw, target, numBuckets, textCol)
      .collect()
    val entries = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val m = typedLit(entries)
    df => {
      val toks = TextAnalysis.tokens(
        lower(coalesce(col(textCol), lit(""))))
      val s = aggregate(toks, lit(0.0), (acc, t) =>
        acc + coalesce(
          element_at(m, featureId(t, numBuckets)), lit(0.0)))
      df.withColumn("avg_log_ratio",
          round(s / size(toks).cast("double"), 4))
        .filter(col("avg_log_ratio") >= minAvgLogRatio)
    }
  }

  /** The act step: keep the `n` most target-like raw documents —
    * the deterministic top-n variant of DSIR's resampling (ranking by
    * weight rather than Gumbel-perturbed sampling, so the kept set is
    * a pure function of the corpora; ties at the display-rounded
    * weight break by id). `n` is bounded, so the selection is a
    * TakeOrdered (k-sized heaps per partition), never a global sort
    * of the corpus. */
  def importanceSelect(
      raw: DataFrame,
      target: DataFrame,
      n: Int,
      numBuckets: Int = 4096,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val weights = importanceWeights(raw, target, numBuckets, idCol, textCol)
      .select(col(idCol),
        round(col("avg_log_ratio"), 4).as("w"))
      .orderBy(col("w").desc, col(idCol))
      .limit(n)
    raw.join(broadcast(weights.select(col(idCol))), Seq(idCol), "left_semi")
  }
}
