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

    // 2. near dedup: drop the larger id of each verified near-pair.
    // The pair list is eagerly materialized (localCheckpoint) so the
    // LSH pass's wide shingle caches are released before this call
    // returns — a curation run leaves nothing in the session cache —
    // and the drop list (≪ corpus, no Catalyst stats) broadcasts
    // instead of shuffling the corpus.
    val dropNear = broadcast(Dedup
      .nearDupPairsMaterialized(exactDeduped, idCol, textCol,
        minJaccard = cfg.nearDupJaccard)
      .select(col("id_b").as(idCol))
      .distinct())
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

  /** Per-source quality gate: keep the `n` best documents of each
    * source by [[TextAnalysis.qualityScore]] (ties broken by id) —
    * the "cap every source at its best N" mixture-curation step,
    * which unlike a score threshold guarantees a bounded contribution
    * from every source.
    *
    * Scale: one window rank per source partition — a single keyed
    * shuffle, no global sort; the score itself is row-local column
    * algebra fused into the scan. A single gigantic source makes this
    * partition-skewed — there, pre-filter with a per-source score
    * threshold (a bounded aggregate) before ranking. */
  def topQualityPerSource(
      docs: DataFrame,
      n: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("__graft_rk",
        row_number().over(Window.partitionBy(col(sourceCol))
          .orderBy(col("quality").desc, col(idCol))))
      .filter(col("__graft_rk") <= n)
      .drop("__graft_rk")
  }

  /** Audit summary: how many rows survive each stage — one eager LSH
    * pass for the near-dup drop list, then ONE aggregate over
    * per-stage survival flags.
    *
    * Earlier revisions ran three separate actions (`docs.count()`, an
    * exact-dedup count, then `curate(...).count()` re-executing the
    * whole pipeline including the LSH join) — 3× the most expensive
    * pipeline in the engine at 100 TB. Now every row is tagged with
    * per-stage survival flags and one `agg` computes all cumulative
    * counts; the MinHash-LSH pass runs exactly once (eagerly, via
    * [[Dedup.nearDupPairsMaterialized]], which also releases its
    * shingle caches before the aggregate runs).
    */
  def auditCounts(
      docs: DataFrame,
      cfg: Config = Config(),
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)

    // ids surviving exact dedup (min id per content hash)
    val keepExact = docs
      .groupBy(Dedup.contentHash(text).as("h"))
      .agg(min(id).as(idCol))
      .select(id)
    // near-dup drops, computed over the exact-kept subset only (same
    // semantics as curate(): LSH pairs are found among representatives;
    // same materialize-and-release cache contract too)
    val exactDeduped = docs.join(keepExact, Seq(idCol), "left_semi")
    val dropNear = Dedup
      .nearDupPairsMaterialized(exactDeduped, idCol, textCol,
        minJaccard = cfg.nearDupJaccard)
      .select(col("id_b").as(idCol))
      .distinct()

    val langOk =
      if (cfg.langs.isEmpty) lit(true)
      else TextAnalysis.langId(text).isin(cfg.langs.map(lit(_)): _*)
    val flagged = docs
      .join(keepExact.withColumn("__k_exact", lit(1)), Seq(idCol), "left")
      .join(dropNear.withColumn("__d_near", lit(1)), Seq(idCol), "left")
      .select(
        coalesce(col("__k_exact"), lit(0)).as("k_exact"),
        when(col("__k_exact") === 1 && col("__d_near").isNull, 1)
          .otherwise(0).as("k_near"),
        when(length(text) >= cfg.minChars &&
          TextAnalysis.qualityScore(text) >= cfg.minQuality && langOk, 1)
          .otherwise(0).as("k_qual"))

    flagged
      .agg(
        count(lit(1)).as("input"),
        sum(col("k_exact")).as("after_exact_dedup"),
        sum(when(col("k_near") === 1 && col("k_qual") === 1, 1L)
          .otherwise(0L)).as("curated"))
      .selectExpr(
        """stack(3,
             'input', input,
             'after_exact_dedup', after_exact_dedup,
             'curated', curated) AS (stage, n_docs)""")
  }

  /** Mixture-design grid: document count and token mass per (quality
    * decile × power-of-two length bucket) — the 2-D histogram a
    * mixture designer reads before setting per-bucket keep rates
    * (is the high-quality mass long docs or short ones? where does
    * the token budget actually sit?). One narrow projection feeding
    * one map-side-combined aggregate over ≤10×~16 cells; nothing
    * else moves at any corpus size. */
  def qualityGrid(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(
        TextAnalysis.qualityScore(col(textCol)).as("q"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .select(
        least(lit(9), floor(col("q") * 10).cast("int")).as("q_decile"),
        pow(lit(2.0), ceil(log(2.0, greatest(col("n_tokens"), lit(1L)))))
          .cast("long").as("len_bucket"),
        col("n_tokens"))
      .groupBy("q_decile", "len_bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"))
      .orderBy("q_decile", "len_bucket")

  /** Cross-table coverage audit: every document should have exactly
    * one embedding row and vice versa — the referential-integrity
    * check a multi-stage pipeline runs before training (a failed
    * embedding job leaves orphan docs; a stale embedding table leaves
    * orphan vectors; either silently skews the mixture downstream).
    * One row: matched count, orphans on each side, and id-sum
    * fingerprints of the orphan sets so two runs can be diffed
    * without materializing them. Full-outer on the key — one shuffle,
    * null-count arithmetic, no second pass. */
  def coverageAudit(
      docs: DataFrame,
      embeddings: DataFrame,
      docIdCol: String = "doc_id",
      vecIdCol: String = "vec_id"): DataFrame =
    docs.select(col(docIdCol).as("__did"))
      .join(embeddings.select(col(vecIdCol).as("__vid")),
        col("__did") === col("__vid"), "full_outer")
      .agg(
        count(when(col("__did").isNotNull && col("__vid").isNotNull, true))
          .as("n_matched"),
        count(when(col("__vid").isNull, true)).as("n_docs_without_vec"),
        count(when(col("__did").isNull, true)).as("n_vecs_without_doc"),
        coalesce(sum(when(col("__vid").isNull, col("__did"))), lit(0L))
          .as("orphan_doc_id_sum"),
        coalesce(sum(when(col("__did").isNull, col("__vid"))), lit(0L))
          .as("orphan_vec_id_sum"))
}
