package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed pipeline a training-data
  * run actually executes, built from the individual operators —
  *
  *   1. exact dedup     keep min-id per SHA-256 content group
  *   2. near dedup      drop the higher id of every MinHash-LSH pair
  *                      with verified Jaccard ≥ nearDupJaccard
  *   3. quality gate    length / stopword / punctuation composite
  *   4. language gate   optional lang allowlist (heuristic lang-ID)
  *
  * Each stage is a DataFrame→DataFrame transform; the whole pipeline
  * is ONE lazy plan (Catalyst fuses the filters; the only shuffles are
  * the two dedup stages' hash groupings — both on compact keys).
  * Output adds provenance columns so downstream can audit drops.
  */
object Curate {

  final case class Config(
      nearDupJaccard: Double = 0.85,
      minQuality: Double = 0.25,
      minChars: Int = 20,
      langs: Seq[String] = Seq.empty)

  /** Returns the curated corpus: surviving rows of `docs` plus
    * `quality` and `lang_pred` provenance columns. */
  def curate(
      docs: DataFrame,
      cfg: Config = Config(),
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)

    // 1. exact dedup: representative = min id per content hash
    val keepExact = docs
      .groupBy(Dedup.contentHash(text).as("h"))
      .agg(min(id).as(idCol))
      .select(idCol)
    val exactDeduped = docs.join(keepExact, Seq(idCol), "left_semi")

    // 2. near dedup: drop the larger id of each verified near-pair
    val dropNear = Dedup
      .nearDupMinhash(exactDeduped, idCol, textCol,
        minJaccard = cfg.nearDupJaccard)
      .select(col("id_b").as(idCol))
      .distinct()
    val nearDeduped = exactDeduped.join(dropNear, Seq(idCol), "left_anti")

    // 3+4. quality and language gates (single fused projection+filter)
    val scored = nearDeduped
      .withColumn("quality", TextAnalysis.qualityScore(text))
      .withColumn("lang_pred", TextAnalysis.langId(text))
      .filter(length(text) >= cfg.minChars &&
        col("quality") >= cfg.minQuality)
    if (cfg.langs.isEmpty) scored
    else scored.filter(col("lang_pred").isin(cfg.langs.map(lit(_)): _*))
  }

  /** Audit summary: how many rows each stage removed. */
  def auditCounts(
      docs: DataFrame,
      cfg: Config = Config(),
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val total = docs.count()
    val afterExact = docs
      .groupBy(Dedup.contentHash(col(textCol)).as("h"))
      .agg(min(col(idCol)).as(idCol)).count()
    val curated = curate(docs, cfg, idCol, textCol).count()
    Seq(
      ("input", total),
      ("after_exact_dedup", afterExact),
      ("curated", curated))
      .toDF("stage", "n_docs")
  }
}
