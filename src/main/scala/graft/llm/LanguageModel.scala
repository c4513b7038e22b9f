package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring — the deterministic stand-in
  * for the perplexity filter training-data pipelines run (a real LM
  * isn't in this container; the *pipeline shape* is identical): learn
  * token frequencies from the corpus, score each document by its
  * average token log-probability, drop the tail.
  *
  * Scale design: the model is the top-`vocabSize` tokens — bounded by
  * construction, so it broadcasts no matter how large the corpus is;
  * everything below the cut scores at a floor probability
  * (`0.5 / total_tokens`, OOV included). Learning is one map-side-
  * combined groupBy over exploded tokens; scoring re-explodes and
  * probes the broadcast vocab — no fact-fact shuffle anywhere. The
  * vocab cut is ordered `(count DESC, token ASC)`, so membership is
  * deterministic even across tied counts and an oracle can recompute
  * it exactly.
  */
object LanguageModel {

  /** `(token, cnt)` for the `vocabSize` most frequent lowercased
    * whitespace tokens; ties broken lexicographically. */
  def vocab(
      docs: DataFrame,
      textCol: String = "text",
      vocabSize: Int = 1000): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    docs
      .select(explode(
        TextAnalysis.tokens(lower(coalesce(col(textCol), lit("")))))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(vocabSize)
  }

  /** Per-document unigram score: `(idCol, n_tokens, avg_logprob)`
    * (join back on `idCol` to recover document columns) where
    * `avg_logprob` is the mean of `ln(cnt / total)` over the
    * document's tokens, with tokens outside the top-`vocabSize` vocab
    * floored at `ln(0.5 / total)`. `total` counts ALL corpus tokens
    * (not only in-vocab), so scores are comparable across vocab
    * sizes. */
  def scoreUnigram(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      vocabSize: Int = 1000): DataFrame = {
    val toks = docs.select(
      col(idCol),
      explode(TextAnalysis.tokens(lower(coalesce(col(textCol), lit("")))))
        .as("token"))
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    // persisted: `counts` (vocab-sized — tiny next to the corpus) feeds
    // two independent broadcast subplans (the total and the top-K cut);
    // unpersisted, Catalyst inlines the exploded groupBy into each, so
    // the full corpus tokenize+shuffle would run twice. Learning is
    // then ONE pass over the corpus; scoring below is the second,
    // inherent pass. (Same pattern as Dedup.nearDupMinhash's shared
    // shingle frame.)
    val counts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = counts.agg(sum(col("cnt")).as("total_tokens"))
    val v = counts.orderBy(col("cnt").desc, col("token")).limit(vocabSize)
    toks
      .join(broadcast(v), Seq("token"), "left")
      .crossJoin(broadcast(total))
      .select(
        col(idCol),
        log(coalesce(col("cnt").cast("double"), lit(0.5)) /
          col("total_tokens")).as("logp"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        avg(col("logp")).as("avg_logprob"))
  }
}
