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
  * [[noveltyVsReferenceBloom]] applies the Bloom pre-prune of
  * [[Dedup.contaminationHitsBloom]]: reference shingles collapse to a
  * bit-set sketch, and candidate shingles the sketch has never seen
  * are counted novel without entering the join.
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
    graft.functions.GraftFunctions.register(candidates.sparkSession)
    val cand = shingled(candidates, Seq(idCol), k, textCol)
      // shingles() emits a distinct set per doc already; the explode
      // preserves that, so (id, shingle) is unique without a shuffle
    val ref = shingled(reference, Seq.empty, k, textCol).distinct()
    val novel = cand.join(ref, Seq("shingle"), "left_anti")
      .groupBy(idCol).agg(count(lit(1)).as("n_novel"))
    perDocRollup(candidates, cand, novel, idCol)
  }

  /** [[noveltyVsReference]] with a Bloom pre-prune on the candidate
    * shingles — the shape for a reference whose distinct-shingle set
    * is too large to anti-join every candidate shingle against: the
    * reference collapses to a bit-set sketch (~10 bits/shingle), and
    * each candidate shingle consults the broadcast sketch inside the
    * scan's codegen stage. A shingle the sketch has NEVER seen is
    * PROVABLY novel (Bloom filters have no false negatives) and is
    * counted without touching the join; only sketch hits — truly-seen
    * shingles plus the fpp sliver — reach the exact anti join, so in
    * the interesting case (a mostly-novel crawl) the join input
    * shrinks by orders of magnitude. False positives only route extra
    * shingles into the exact join, so the rows are identical to
    * [[noveltyVsReference]] — NoveltySpec pins frame equality and the
    * registered query shares the plain variant's oracle verbatim. */
  def noveltyVsReferenceBloom(
      candidates: DataFrame,
      reference: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      expectedShingles: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    require(k >= 1, s"shingle size must be ≥ 1: $k")
    graft.functions.GraftFunctions.register(candidates.sparkSession)
    import graft.functions.BloomExprs
    val ref = shingled(reference, Seq.empty, k, textCol).distinct()
    val m = BloomExprs.optimalNumBits(expectedShingles, fpp)
    val kk = BloomExprs.optimalK(m, expectedShingles)
    val sketch = ref
      .agg(BloomExprs.bloom_agg(xxhash64(col("shingle")), m, kk).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val cand = shingled(candidates, Seq(idCol), k, textCol)
      .withColumn("maybe_seen", BloomExprs.bloom_might_contain(
        lit(sketch), xxhash64(col("shingle")), kk))
    // sketch misses: provably novel, counted map-side with no join
    val novelByMiss = cand.filter(!col("maybe_seen"))
      .groupBy(idCol).agg(count(lit(1)).as("n_miss"))
    // sketch hits: the exact anti join decides
    val novelByJoin = cand.filter(col("maybe_seen"))
      .join(ref, Seq("shingle"), "left_anti")
      .groupBy(idCol).agg(count(lit(1)).as("n_fp"))
    val novel = novelByMiss
      .join(novelByJoin, Seq(idCol), "full_outer")
      .select(col(idCol),
        (coalesce(col("n_miss"), lit(0L)) +
          coalesce(col("n_fp"), lit(0L))).as("n_novel"))
    perDocRollup(candidates, cand.drop("maybe_seen"), novel, idCol)
  }

  /** `(id, shingle)` per row; id columns optional (reference side). */
  private def shingled(
      df: DataFrame, cols: Seq[String], k: Int, textCol: String) =
    df.select(
      (cols.map(col) :+
        explode(Dedup.shingles(col(textCol), k)).as("shingle")): _*)

  /** Join per-doc novel counts and totals back onto every candidate
    * id (docs with no shingles score novelty 1.0 with zero counts). */
  private def perDocRollup(
      candidates: DataFrame,
      cand: DataFrame,
      novel: DataFrame,
      idCol: String): DataFrame = {
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
