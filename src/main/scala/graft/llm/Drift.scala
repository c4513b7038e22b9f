package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift detection — the distribution-shift monitor a training
  * pipeline runs on every incoming batch: compare the token
  * distribution of a candidate corpus against a reference corpus and
  * report KL divergence (both directions) and the symmetric, bounded
  * Jensen–Shannon divergence, plus the single most-drifted token for
  * drill-down. (Reference analog: the corpus-level profiling loops in
  * `mirrulations-iceberg/demo_optimized_data.py` compare per-slice
  * counts; this is the probabilistic generalization a 100 TB pipeline
  * needs to notice a scraper gone bad or a source mix change.)
  *
  * Semantics (chosen to be exactly oracle-recomputable):
  *   - vocab = top-`vocabSize` tokens of the POOLED distribution,
  *     ordered `(cnt_a + cnt_b DESC, token ASC)` — deterministic under
  *     ties, same cut rule as [[LanguageModel.vocab]];
  *   - within the vocab, add-half smoothing over the k kept tokens:
  *     `p = (cnt_a + 0.5) / (tot_a + 0.5·k)` (likewise `q`), so a token
  *     absent from one side never yields `ln(0)`;
  *   - `kl_ab = Σ p·ln(p/q)`, `kl_ba = Σ q·ln(q/p)`,
  *     `js = ½Σ p·ln(p/m) + ½Σ q·ln(q/m)` with `m = (p+q)/2`;
  *   - `top_drift_token` = argmax |p−q|, ties to the smaller token.
  *
  * Scale design: each side collapses to `(token, cnt)` in ONE
  * map-side-combined aggregate — the corpus text never shuffles, only
  * bounded count pairs keyed by token. The pooled top-k cut is a
  * TakeOrdered over those counts, and the final divergence is a single
  * scalar aggregate over ≤ `vocabSize` rows with the (3-column) totals
  * frame broadcast. No stage is proportional to documents × documents
  * or documents × vocab.
  */
object Drift {

  private def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(
        TextAnalysis.tokens(lower(coalesce(col(textCol), lit("")))))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Single-row drift summary between two corpora (see object doc for
    * the exact recipe): `(n_vocab, tokens_a, tokens_b, kl_ab, kl_ba,
    * js_divergence, top_drift_token, top_drift_abs)`. Divergences are
    * in nats, unrounded; callers round for display/oracle hashing.
    * On two empty corpora the row degrades to zeros/null token. */
  def driftSummary(
      docsA: DataFrame,
      docsB: DataFrame,
      textCol: String = "text",
      vocabSize: Int = 1000): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    val ca = tokenCounts(docsA, textCol)
      .withColumnRenamed("cnt", "cnt_a")
    val cb = tokenCounts(docsB, textCol)
      .withColumnRenamed("cnt", "cnt_b")
    val pooled = ca.join(cb, Seq("token"), "full_outer")
      .select(
        col("token"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val vocab = pooled
      .orderBy((col("cnt_a") + col("cnt_b")).desc, col("token"))
      .limit(vocabSize)
    // k and the per-side totals are computed over the KEPT vocab (not
    // the full pooled table) so smoothing mass matches what the sums
    // below actually see; the totals frame is 1 row — broadcast.
    val totals = vocab.agg(
      count(lit(1)).as("k"),
      coalesce(sum(col("cnt_a")), lit(0L)).as("tot_a"),
      coalesce(sum(col("cnt_b")), lit(0L)).as("tot_b"))
    val probs = vocab
      .crossJoin(broadcast(totals))
      .select(
        col("token"), col("k"), col("tot_a"), col("tot_b"),
        ((col("cnt_a") + lit(0.5)) /
          (col("tot_a") + lit(0.5) * col("k"))).as("p"),
        ((col("cnt_b") + lit(0.5)) /
          (col("tot_b") + lit(0.5) * col("k"))).as("q"))
      .withColumn("m", (col("p") + col("q")) / lit(2.0))
      .withColumn("absdiff", abs(col("p") - col("q")))
    probs.agg(
      coalesce(max(col("k")), lit(0L)).as("n_vocab"),
      coalesce(max(col("tot_a")), lit(0L)).as("tokens_a"),
      coalesce(max(col("tot_b")), lit(0L)).as("tokens_b"),
      coalesce(sum(col("p") * log(col("p") / col("q"))), lit(0.0))
        .as("kl_ab"),
      coalesce(sum(col("q") * log(col("q") / col("p"))), lit(0.0))
        .as("kl_ba"),
      coalesce(
        lit(0.5) * sum(col("p") * log(col("p") / col("m"))) +
          lit(0.5) * sum(col("q") * log(col("q") / col("m"))),
        lit(0.0)).as("js_divergence"),
      // argmax |p−q| with ties to the smaller token: min_by over the
      // composite (−absdiff, token) — struct comparison is field-wise,
      // so minimizing −absdiff maximizes the drift and the second
      // field breaks exact-tie doubles deterministically.
      min_by(col("token"),
        struct((-col("absdiff")).as("d"), col("token")))
        .as("top_drift_token"),
      coalesce(max(col("absdiff")), lit(0.0)).as("top_drift_abs"))
  }

  /** Reference vocabulary for [[driftAgainstFrozen]]: the top-`vocabSize`
    * `(token, ref_cnt)` of a reference corpus, ties broken
    * lexicographically — compute once, persist/broadcast, reuse across
    * every batch scored against it. */
  /** Numeric-distribution drift: Population Stability Index terms of
    * `current` vs `reference` over `nBins` equal-width bins anchored
    * at the REFERENCE min/max — the feature-pipeline companion of the
    * token-drift monitor (a feature whose distribution slides between
    * training and serving shows up here before it shows up in model
    * metrics). Equal-width bins (not quantile bins) on purpose:
    * min/max are exact aggregates, so the bin edges — and therefore
    * every count — are reproducible bit-for-bit by any engine, with
    * no interpolated-quantile parity risk. Per-bin smoothed fractions
    * (+0.5 Laplace) keep empty bins finite; PSI = Σ psi_term.
    *
    * Scale: each side collapses to ≤nBins rows in one map-side-
    * combined aggregate after a broadcast of the 1-row min/max frame;
    * values never shuffle. */
  def psiNumeric(
      reference: DataFrame,
      current: DataFrame,
      valueCol: String,
      nBins: Int = 10): DataFrame =
    psiFromBins(referenceBins(reference, valueCol, nBins),
      current, valueCol, nBins)

  /** The equal-width bin index for a (v, lo, hi) row set; the shared
    * binning rule of [[referenceBins]] and [[psiFromBins]] (one
    * definition → the two sides can never disagree on an edge). */
  private def binCol(nBins: Int) =
    when(col("lo").isNull || col("hi") === col("lo"), lit(0))
      .otherwise(least(lit(nBins - 1), greatest(lit(0),
        floor((col("v") - col("lo")) /
          ((col("hi") - col("lo")) / nBins)).cast("int"))))

  /** Frozen yardstick for [[psiFromBins]]: the reference collapsed
    * ONCE to its ≤`nBins` rows `(lo, hi, bin, n_ref)` — exact min/max
    * plus equal-width bin counts. Compute once, keep the (tiny)
    * result, and score every batch against it; the streaming monitor
    * ([[graft.streaming.Incremental.psiStream]]) materializes this at
    * stream setup so no micro-batch ever re-scans the reference.
    * [[psiNumeric]] is the one-shot composition of this with
    * [[psiFromBins]]. */
  def referenceBins(
      reference: DataFrame,
      valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    val stats = reference.agg(
      min(col(valueCol)).cast("double").as("lo"),
      max(col(valueCol)).cast("double").as("hi"))
    reference.select(col(valueCol).cast("double").as("v"))
      .crossJoin(broadcast(stats))
      .select(col("lo"), col("hi"), binCol(nBins).as("bin"))
      .groupBy("lo", "hi", "bin").agg(count(lit(1)).as("n_ref"))
  }

  /** PSI terms of `current` against a precomputed [[referenceBins]]
    * frame — the per-batch arm of [[psiNumeric]], costing one bounded
    * aggregate over the batch plus a broadcast of the 1-row (lo, hi)
    * stats recovered from the bins themselves. */
  def psiFromBins(
      refBins: DataFrame,
      current: DataFrame,
      valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    // lo/hi are constant across the (≤nBins) rows; max() recovers them
    // as a 1-row frame that stays 1 row (all-null) on an empty
    // reference — same degradation as psiNumeric's direct stats pass
    val stats = refBins.agg(
      max(col("lo")).as("lo"), max(col("hi")).as("hi"))
    val cur = current.select(col(valueCol).cast("double").as("v"))
      .crossJoin(broadcast(stats))
      .select(binCol(nBins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_cur"))
    val bins = refBins.select(col("bin"), col("n_ref"))
      .join(cur, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = bins.agg(
      sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    bins.crossJoin(broadcast(tot))
      .withColumn("__p",
        (col("n_ref") + lit(0.5)) / (col("t_ref") + lit(0.5) * nBins))
      .withColumn("__q",
        (col("n_cur") + lit(0.5)) / (col("t_cur") + lit(0.5) * nBins))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("__p"), 4).as("ref_frac"),
        round(col("__q"), 4).as("cur_frac"),
        round((col("__q") - col("__p")) * log(col("__q") / col("__p")), 6)
          .as("psi_term"))
      .orderBy("bin")
  }

  def referenceVocab(
      refDocs: DataFrame,
      textCol: String = "text",
      vocabSize: Int = 500): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    tokenCounts(refDocs, textCol)
      .withColumnRenamed("cnt", "ref_cnt")
      .orderBy(col("ref_cnt").desc, col("token"))
      .limit(vocabSize)
  }

  /** Drift of a batch against a FROZEN reference distribution: JS
    * divergence over the reference's own vocab (`refVocab` from
    * [[referenceVocab]]) with the same add-half smoothing as
    * [[driftSummary]]. The vocab is the fixed yardstick — batch tokens
    * outside it are ignored by design, so consecutive batches are
    * comparable on the same axis (and the reference side of the
    * divergence never moves). One row: `(n_vocab, tokens_batch,
    * js_divergence, top_drift_token, top_drift_abs)`, unrounded.
    *
    * Scale design: the batch collapses to `(token, cnt)` map-side;
    * the ≤`vocabSize`-row reference is broadcast into the join, so the
    * scoring cost per batch is one bounded aggregate — the shape that
    * lets [[graft.streaming.Incremental.driftStream]] run it per
    * micro-batch indefinitely. */
  def driftAgainstFrozen(
      docs: DataFrame,
      refVocab: DataFrame,
      textCol: String = "text"): DataFrame = {
    val grid = broadcast(refVocab)
      .join(tokenCounts(docs, textCol), Seq("token"), "left")
      .na.fill(0L, Seq("cnt"))
    val totals = grid.agg(
      count(lit(1)).as("k"),
      coalesce(sum(col("cnt")), lit(0L)).as("tot_b"),
      coalesce(sum(col("ref_cnt")), lit(0L)).as("tot_r"))
    grid
      .crossJoin(broadcast(totals))
      .select(
        col("token"), col("k"), col("tot_b"),
        ((col("cnt") + lit(0.5)) /
          (col("tot_b") + lit(0.5) * col("k"))).as("p"),
        ((col("ref_cnt") + lit(0.5)) /
          (col("tot_r") + lit(0.5) * col("k"))).as("q"))
      .withColumn("m", (col("p") + col("q")) / lit(2.0))
      .withColumn("absdiff", abs(col("p") - col("q")))
      .agg(
        coalesce(max(col("k")), lit(0L)).as("n_vocab"),
        coalesce(max(col("tot_b")), lit(0L)).as("tokens_batch"),
        coalesce(
          lit(0.5) * sum(col("p") * log(col("p") / col("m"))) +
            lit(0.5) * sum(col("q") * log(col("q") / col("m"))),
          lit(0.0)).as("js_divergence"),
        min_by(col("token"),
          struct((-col("absdiff")).as("d"), col("token")))
          .as("top_drift_token"),
        coalesce(max(col("absdiff")), lit(0.0)).as("top_drift_abs"))
  }

  /** Per-source drift drill-down: for every source, the JS divergence
    * of ITS token distribution against the rest of the corpus, over
    * one GLOBAL pooled top-`vocabSize` vocab (same cut/smoothing rules
    * as [[driftSummary]]; the rest-side counts are `global − source`,
    * so no second corpus pass). Answers "which scraper went bad" after
    * [[driftSummary]] fires. Output per source: `(source, tokens_src,
    * js_divergence, top_drift_token, top_drift_abs)`, ordered by
    * source.
    *
    * Scale design: the corpus collapses ONCE to `(source, token, cnt)`
    * (map-side combined; the global distribution re-aggregates those
    * pairs, not the text). The scored grid is the dense
    * vocab × sources frame — `vocabSize · n_sources` rows by
    * construction, built by broadcasting the ≤`vocabSize`-row vocab —
    * and the only unbounded shuffle is keyed `(source, token)`. A
    * single-source corpus degrades gracefully: the rest-side smooths
    * to uniform rather than dividing by zero. */
  def driftBySource(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text",
      vocabSize: Int = 500): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    // (source, token, cnt) is consumed three times (vocab cut, in-vocab
    // join, per-source totals). Eager localCheckpoint instead of
    // persist: same materialize-once economics, but the blocks are
    // freed by the ContextCleaner as soon as the returned frame is
    // unreachable — a CacheManager persist pins the plan until an
    // explicit unpersist this lazy-returning operator could never
    // issue, which is how the round-8 bench session accumulated
    // caches until warm passes ran slower than cold. (Trade: on
    // executor loss the checkpointed blocks are gone and the job
    // fails rather than recomputes — acceptable for an aggregated,
    // corpus-much-smaller frame.)
    val tokSrc = docs
      .select(
        col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(
          lower(coalesce(col(textCol), lit(""))))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val vocab = tokSrc
      .groupBy("token").agg(sum(col("cnt")).as("gcnt"))
      .orderBy(col("gcnt").desc, col("token"))
      .limit(vocabSize)
    val inVocab = tokSrc
      .join(broadcast(vocab.select(col("token"))), Seq("token"))
    val perSrc = inVocab.groupBy("source")
      .agg(sum(col("cnt")).as("tot_s"))
    val globTot = vocab.agg(
      count(lit(1)).as("k"),
      coalesce(sum(col("gcnt")), lit(0L)).as("tot_g"))
    broadcast(vocab)
      .crossJoin(perSrc)
      .join(inVocab, Seq("source", "token"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(globTot))
      .select(
        col("source"), col("token"), col("tot_s"),
        ((col("cnt") + lit(0.5)) /
          (col("tot_s") + lit(0.5) * col("k"))).as("p"),
        ((col("gcnt") - col("cnt") + lit(0.5)) /
          (col("tot_g") - col("tot_s") + lit(0.5) * col("k"))).as("q"))
      .withColumn("m", (col("p") + col("q")) / lit(2.0))
      .withColumn("absdiff", abs(col("p") - col("q")))
      .groupBy("source")
      .agg(
        max(col("tot_s")).as("tokens_src"),
        (lit(0.5) * sum(col("p") * log(col("p") / col("m"))) +
          lit(0.5) * sum(col("q") * log(col("q") / col("m"))))
          .as("js_divergence"),
        min_by(col("token"),
          struct((-col("absdiff")).as("d"), col("token")))
          .as("top_drift_token"),
        max(col("absdiff")).as("top_drift_abs"))
      .orderBy("source")
  }

  /** Membership diff between two corpus snapshots — the release-diff
    * every dataset version bump ships with ("what changed since the
    * corpus the last model trained on?"). Documents pair by id; a
    * paired doc counts as changed when its CONTENT digest differs
    * (so a re-crawl that rewrites a page is `changed`, not
    * removed+added). One row:
    * `(n_prev, n_cur, n_added, n_removed, n_changed, n_unchanged,
    * added_id_sum, removed_id_sum)` — the id sums pin membership, not
    * just counts.
    *
    * Scale shape: each side collapses to `(id, 32-B digest)` in a
    * narrow projection — the text never shuffles — then ONE
    * full-outer hash join keyed on the id and a map-side-combined
    * global aggregate over the category flags. At 100 TB this is two
    * digest passes + one join of 40-B rows. */
  def corpusDiff(
      prev: DataFrame,
      cur: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def digests(df: DataFrame, dg: String) = df.select(
      col(idCol), Dedup.contentHash(col(textCol)).as(dg))
    digests(prev, "dg_prev")
      .join(digests(cur, "dg_cur"), Seq(idCol), "full_outer")
      .agg(
        count(col("dg_prev")).as("n_prev"),
        count(col("dg_cur")).as("n_cur"),
        count(when(col("dg_prev").isNull, 1)).as("n_added"),
        count(when(col("dg_cur").isNull, 1)).as("n_removed"),
        count(when(col("dg_prev").isNotNull && col("dg_cur").isNotNull &&
          col("dg_prev") =!= col("dg_cur"), 1)).as("n_changed"),
        count(when(col("dg_prev") === col("dg_cur"), 1)).as("n_unchanged"),
        coalesce(sum(when(col("dg_prev").isNull, col(idCol))), lit(0L))
          .as("added_id_sum"),
        coalesce(sum(when(col("dg_cur").isNull, col(idCol))), lit(0L))
          .as("removed_id_sum"))
  }

  /** Per-source distinctive terms: which tokens OVER-index in each
    * source versus the rest of the corpus. [[driftBySource]] names the
    * drifting source; this names the terms responsible — the
    * drill-down a curation pipeline runs before deciding whether a
    * drifted source is a scraper bug (boilerplate tokens dominate) or
    * a genuine topic shift. Scoring is the log-odds-ratio with an
    * informative Dirichlet prior (Monroe, Colaresi & Quinn 2008,
    * "Fightin' Words"), the standard corpus-comparison statistic:
    * for source s and token w with in-vocab counts `y_sw`, per-source
    * total `n_s`, global count `y_w`, global total `n`:
    *
    *   α_w = α₀·y_w/n                       (prior mass ∝ global rate)
    *   δ   = ln[(y_sw+α_w)/(n_s+α₀−y_sw−α_w)]
    *         − ln[(y_w−y_sw+α_w)/(n−n_s+α₀−(y_w−y_sw)−α_w)]
    *   σ²  ≈ 1/(y_sw+α_w) + 1/(y_w−y_sw+α_w)
    *   z   = δ/σ
    *
    * The prior shrinks rare-token noise (a token seen 3 times in one
    * source scores near 0, not ∞) without the min-count cutoffs a raw
    * log-odds needs. Keeps the `topN` tokens per source by
    * `(round(z,6) DESC, token ASC)` — deterministic under ties.
    * Returns `(source, rank, token, cnt, z_score)` with z rounded to
    * 4 for display/oracle hashing.
    *
    * Scale shape (same as [[driftBySource]]): the corpus collapses
    * ONCE to the `(source, token, cnt)` grid map-side; the vocab cut
    * is a TakeOrdered over bounded counts; every formula above runs on
    * the dense broadcast-vocab × sources frame (K·S rows by
    * construction); the final rank is a window over ≤K rows per
    * source. No stage is proportional to corpus size except the one
    * token-count scan. Single-source corpora degrade gracefully: the
    * "rest" side is pure prior mass, so every z collapses toward 0
    * rather than dividing by zero. */
  def distinctiveTerms(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text",
      vocabSize: Int = 500,
      topN: Int = 5,
      alpha0: Double = 100.0): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    require(topN > 0, s"topN must be positive: $topN")
    require(alpha0 > 0, s"alpha0 must be positive: $alpha0")
    import org.apache.spark.sql.expressions.Window
    // same materialize-once economics as driftBySource (see the
    // localCheckpoint note there)
    val tokSrc = docs
      .select(
        col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(
          lower(coalesce(col(textCol), lit(""))))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val vocab = tokSrc
      .groupBy("token").agg(sum(col("cnt")).as("gcnt"))
      .orderBy(col("gcnt").desc, col("token"))
      .limit(vocabSize)
    val inVocab = tokSrc
      .join(broadcast(vocab.select(col("token"))), Seq("token"))
    val perSrc = inVocab.groupBy("source")
      .agg(sum(col("cnt")).as("tot_s"))
    val globTot = vocab.agg(
      coalesce(sum(col("gcnt")), lit(0L)).cast("double").as("tot_g"))
    val a0 = lit(alpha0)
    val scored = broadcast(vocab)
      .crossJoin(perSrc)
      .join(inVocab, Seq("source", "token"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(globTot))
      .withColumn("aw", a0 * col("gcnt") / col("tot_g"))
      .withColumn("delta",
        log((col("cnt") + col("aw")) /
          (col("tot_s") + a0 - col("cnt") - col("aw"))) -
          log((col("gcnt") - col("cnt") + col("aw")) /
            (col("tot_g") - col("tot_s") + a0 -
              (col("gcnt") - col("cnt")) - col("aw"))))
      .withColumn("z",
        col("delta") / sqrt(lit(1.0) / (col("cnt") + col("aw")) +
          lit(1.0) / (col("gcnt") - col("cnt") + col("aw"))))
    scored
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("source"))
          .orderBy(round(col("z"), 6).desc, col("token"))))
      .filter(col("rank") <= topN)
      .select(col("source"), col("rank").cast("long").as("rank"),
        col("token"), col("cnt"), round(col("z"), 4).as("z_score"))
      .orderBy("source", "rank")
  }

  /** Embedding-space drift between two corpus snapshots: assign BOTH
    * to the reference snapshot's frozen centroids
    * ([[Similarity.fixedCentroidAssignFrom]] — one yardstick, so the
    * cluster shares are comparable on the same axis), then the PSI of
    * the per-cluster share distribution — the semantic counterpart of
    * the token-level [[driftSummary]]: a scraper that starts emitting
    * a new TOPIC mix moves cluster mass even when its token
    * distribution looks stable.
    *
    * Output: one row per centroid `(centroid_id, n_ref, n_cur,
    * psi_term)` — clusters a snapshot never hits appear with count 0
    * (the dense grid comes from the centroid table, not the data).
    * Laplace-smoothed shares (`(n + 0.5) / (N + 0.5k)`) keep every
    * term finite. `psi_term` is a fixed scalar expression over exact
    * integers (two divisions, one ln, one product — no summation
    * order); readers sum it for the total PSI.
    *
    * Scale: both assignment passes are broadcast-centroid projections
    * (the snapshots never shuffle wide); each collapses map-side to
    * ≤k rows; the PSI algebra runs on the k-row grid. */
  def embeddingDrift(
      reference: DataFrame,
      current: DataFrame,
      k: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val grid = reference.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("centroid_id"))
    def shares(df: DataFrame, name: String) =
      Similarity.fixedCentroidAssignFrom(reference, df, k, idCol, vecCol)
        .groupBy(col("centroid_id"))
        .agg(count(lit(1)).as(name))
    val counts = grid
      .join(shares(reference, "n_ref"), Seq("centroid_id"), "left")
      .join(shares(current, "n_cur"), Seq("centroid_id"), "left")
      .select(col("centroid_id"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = counts.agg(
      sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    counts.crossJoin(broadcast(totals))
      .select(col("centroid_id"), col("n_ref"), col("n_cur"),
        round(
          (((col("n_cur") + lit(0.5)) /
            (col("t_cur") + lit(0.5) * k)) -
           ((col("n_ref") + lit(0.5)) /
            (col("t_ref") + lit(0.5) * k))) *
          log(((col("n_cur") + lit(0.5)) / (col("t_cur") + lit(0.5) * k)) /
              ((col("n_ref") + lit(0.5)) / (col("t_ref") + lit(0.5) * k))),
          6).as("psi_term"))
      .orderBy("centroid_id")
  }
}
