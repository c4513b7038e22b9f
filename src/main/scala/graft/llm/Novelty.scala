package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram novelty of a candidate corpus against a reference corpus:
  * for every candidate document, the fraction of its DISTINCT k-word
  * shingles that appear nowhere in the reference. The inverse of
  * [[Dedup.contaminationHits]]'s question — contamination asks "does
  * this training doc leak the benchmark", novelty asks "how much of
  * this new crawl is text we do not already have" (the
  * acquisition-value / memorization-risk audit run before paying to
  * ingest a new source).
  *
  * Scale: both sides collapse to distinct shingle keys before any
  * join — `(doc, shingle)` for candidates, bare `shingle` for the
  * reference — and the single unbounded shuffle is the anti join
  * keyed on the shingle. No doc×doc stage, and neither corpus's text
  * crosses the wire (shingles only). When the reference is far too
  * large even for its distinct-shingle set to shuffle comfortably,
  * the same Bloom pre-prune used by [[Dedup.contaminationHitsBloom]]
  * applies verbatim (collapse reference shingles to a bit-set sketch,
  * pre-drop candidate shingles that cannot be novel-negative).
  */
object Novelty {

  /** Per-candidate-document novelty: `(idCol, n_shingles, n_novel,
    * novelty)` where `novelty = n_novel / n_shingles` rounded to 4
    * places. A document with no shingle-bearing text (null/blank)
    * scores novelty 1.0 with zero counts — it shares nothing with the
    * reference. [[Dedup.shingles]] semantics apply: fewer than k
    * tokens yields the whole text as a single shingle. */
  def noveltyVsReference(
      candidates: DataFrame,
      reference: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"shingle size must be ≥ 1: $k")
    def shingled(df: DataFrame, cols: Seq[String]) =
      df.select(
        (cols.map(col) :+
          explode(Dedup.shingles(col(textCol), k)).as("shingle")): _*)
    val cand = shingled(candidates, Seq(idCol))
      // shingles() emits a distinct set per doc already; the explode
      // preserves that, so (id, shingle) is unique without a shuffle
    val ref = shingled(reference, Seq.empty).distinct()
    val novel = cand.join(ref, Seq("shingle"), "left_anti")
      .groupBy(idCol).agg(count(lit(1)).as("n_novel"))
    val totals = cand.groupBy(idCol).agg(count(lit(1)).as("n_shingles"))
    candidates.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(novel, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_shingles"), lit(0L)) === 0L, lit(1.0))
          .otherwise(round(
            coalesce(col("n_novel"), lit(0L)).cast("double") /
              col("n_shingles").cast("double"), 4))
          .as("novelty"))
  }

  /** Corpus-level roll-up of [[noveltyVsReference]]: one row —
    * `(n_docs, mean_novelty, n_fully_novel, n_fully_seen)` — the
    * go/no-go summary for ingesting the candidate source. */
  def noveltySummary(
      candidates: DataFrame,
      reference: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    noveltyVsReference(candidates, reference, k, idCol, textCol)
      .agg(
        count(lit(1)).as("n_docs"),
        coalesce(round(avg(col("novelty")), 4), lit(0.0)).as("mean_novelty"),
        sum(when(col("novelty") === 1.0, 1L).otherwise(0L)).as("n_fully_novel"),
        sum(when(col("novelty") === 0.0, 1L).otherwise(0L)).as("n_fully_seen"))
}
