package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Multinomial Naive Bayes text classifier — the fastText-shaped
  * quality-filter a CCNet-style pipeline trains on "known good" vs
  * "known bad" documents and then runs over the whole crawl. Public
  * method (McCallum & Nigam 1998); everything here is count algebra,
  * so the trained model is exactly reproducible and
  * oracle-verifiable.
  *
  * Model: over the pooled top-`vocabSize` tokens of the TRAIN corpus
  * (ties cut `(cnt DESC, token ASC)` — the same deterministic vocab
  * contract as [[LanguageModel]]), each token's log-likelihood ratio
  *   `llr(t) = ln((cnt_pos(t)+1)/(N_pos+V)) − ln((cnt_neg(t)+1)/(N_neg+V))`
  * with add-1 smoothing, where `N_class` is the class's total count
  * over the vocab and `V` the vocab size. A document's score is the
  * class-prior log-ratio plus the sum of `llr` over its tokens (with
  * multiplicity; out-of-vocab tokens contribute 0); `score > 0`
  * predicts positive.
  *
  * Scale: the model is BOUNDED BY CONSTRUCTION — ≤ `vocabSize` llr
  * rows + one prior row — so it broadcasts at any train-corpus size;
  * training is one exploded map-side-combined aggregate over the
  * train corpus, scoring is one narrow pass over the target corpus
  * (explode → broadcast probe → per-doc aggregate). No fact-fact
  * shuffle anywhere.
  */
object Classifier {

  private def toks(df: DataFrame, idCols: Seq[Column], textCol: String) =
    df.select(idCols :+
      explode(TextAnalysis.tokens(
        lower(coalesce(col(textCol), lit(""))))).as("token"): _*)

  /** Train: returns (llr model ≤ vocabSize rows, one prior row).
    * `label` must evaluate to a non-null boolean per train row. */
  def nbTrain(
      train: DataFrame,
      label: Column,
      vocabSize: Int = 1000,
      textCol: String = "text"): (DataFrame, DataFrame) = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    GraftFunctions.register(train.sparkSession)
    val t = toks(train.withColumn("__pos", label), Seq(col("__pos")), textCol)
    // one aggregate computes both class counts per token
    val counts = t.groupBy("token").agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("cnt_pos"),
      sum(when(col("__pos"), 0L).otherwise(1L)).as("cnt_neg"))
    val vocab = counts
      .orderBy((col("cnt_pos") + col("cnt_neg")).desc, col("token"))
      .limit(vocabSize)
    val totals = vocab.agg(
      sum(col("cnt_pos")).as("n_pos"),
      sum(col("cnt_neg")).as("n_neg"))
    val v = lit(vocabSize.toLong)
    val llr = vocab.crossJoin(broadcast(totals))
      .select(col("token"),
        (log((col("cnt_pos") + lit(1L)).cast("double") /
             (col("n_pos") + v).cast("double")) -
         log((col("cnt_neg") + lit(1L)).cast("double") /
             (col("n_neg") + v).cast("double"))).as("llr"))
    val prior = train.agg(
      log((sum(when(label, 1L).otherwise(0L)) + lit(1L)).cast("double") /
          (sum(when(label, 0L).otherwise(1L)) + lit(1L)).cast("double"))
        .as("log_prior"))
    (llr, prior)
  }

  /** Score every document of `docs` with a trained model:
    * `(idCol, n_tokens, n_vocab_hits, nb_score, pred_positive)`. */
  def nbScore(
      docs: DataFrame,
      llr: DataFrame,
      prior: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    toks(docs, Seq(col(idCol)), textCol)
      .join(broadcast(llr), Seq("token"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        count(col("llr")).as("n_vocab_hits"),
        sum(coalesce(col("llr"), lit(0.0))).as("llr_sum"))
      .crossJoin(broadcast(prior))
      .select(col(idCol), col("n_tokens"), col("n_vocab_hits"),
        (col("llr_sum") + col("log_prior")).as("nb_score"))
      .withColumn("pred_positive", col("nb_score") > 0.0)
  }

  /** Train-on-label, score-everything convenience: the quality-filter
    * deployment shape (train on a labeled slice, classify the whole
    * corpus). */
  def nbClassify(
      train: DataFrame,
      label: Column,
      docs: DataFrame,
      vocabSize: Int = 1000,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val (llr, prior) = nbTrain(train, label, vocabSize, textCol)
    nbScore(docs, llr, prior, idCol, textCol)
  }

  /** The act step: keep only documents the classifier predicts
    * positive — one narrow filter over the scored frame. */
  def nbFilter(
      train: DataFrame,
      label: Column,
      docs: DataFrame,
      vocabSize: Int = 1000,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val keep = nbClassify(train, label, docs, vocabSize, idCol, textCol)
      .filter(col("pred_positive"))
      .select(col(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }
}
