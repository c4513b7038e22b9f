package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextHash, TopKAgg}

/** Dataset splitting and sampling for training-data pipelines.
  *
  * The split is a pure function of the document id — NOT `rand()` —
  * so it is stable across runs, partitionings, and cluster sizes, and
  * a document can never migrate between train and test when the
  * corpus is re-processed (the leakage mode that silently corrupts
  * evals). The id is hashed with the engine's rolling `text_hash`
  * (codegen, one pass over the id string), then bucketed mod 100.
  *
  * Scale: one narrow projection — no shuffle, no state; the split of
  * 100 TB costs exactly one pass that fuses into whatever reads next.
  */
object Sampling {

  /** (name, percent) split spec; percents must sum to ≤ 100 (a
    * remainder falls into the last split). */
  type Splits = Seq[(String, Int)]

  val defaultSplits: Splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)

  /** Hash bucket 0..99 for an id column (string-cast first). */
  def bucket(id: Column): Column =
    pmod(TextHash.text_hash(id.cast("string")), lit(100L))

  /** Adds a `split` column assigning each row to a named split. */
  def assignSplit(
      df: DataFrame,
      idCol: String = "doc_id",
      splits: Splits = defaultSplits): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 100,
      s"split percents must sum to <= 100: $splits")
    GraftFunctions.register(df.sparkSession)
    val b = bucket(col(idCol))
    val bounds = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(bounds).init.foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), rest) =>
      when(b < hi, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Split sizes (the verification view of assignSplit). */
  def splitCounts(
      df: DataFrame,
      idCol: String = "doc_id",
      splits: Splits = defaultSplits): DataFrame =
    assignSplit(df, idCol, splits)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split")

  /** Leakage-safe split: assign train/val/test by near-dup CLUSTER,
    * not by document. Per-id hashing ([[assignSplit]]) is stable, but
    * two near-duplicate documents hash independently — one can land in
    * train and the other in test, which leaks training content into
    * the eval (the contamination mode n-gram checks against external
    * benchmarks never see). Here every document's split key is its
    * near-dup component label ([[Dedup.connectedComponents]] over
    * MinHash-LSH pairs at `minJaccard`), so a whole duplicate family
    * moves as one unit; documents with no near-dup keep their own id
    * as the key, making this a strict refinement of [[assignSplit]].
    *
    * Scale: the LSH pair pass + label propagation are the same plans
    * as [[Dedup.clusterDedup]] (pairs eagerly materialized, shingle
    * caches released — zero residual session-cache footprint); the
    * final assignment is an explicitly BROADCAST left join — labels
    * cover only clustered docs (≪ corpus) but come out of an
    * iterative computation Catalyst has no size stats for, so without
    * the hint it plans a sort-merge shuffle of the full corpus
    * against a tiny label set — then a narrow projection. Output
    * keeps the nullable `cluster` column for auditing.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      minJaccard: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text",
      splits: Splits = defaultSplits): DataFrame = {
    val labels = Dedup.connectedComponents(
      Dedup.nearDupPairsMaterialized(docs, minJaccard = minJaccard,
        numHashes = 64, bands = 32, idCol = idCol, textCol = textCol))
    val keyed = docs
      .join(broadcast(labels.withColumnRenamed("id", idCol)),
        Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("cluster"), col(idCol)))
    assignSplit(keyed, "split_key", splits).drop("split_key")
  }

  /** Epoch-seeded training order: the deterministic global shuffle a
    * pipeline runs before writing training shards. Each document gets
    * a `sort_key = text_hash(id + seed)` and a `shard = sort_key mod
    * numShards`; writing each shard sorted by `(sort_key, id)` yields
    * a uniform pseudo-random global order that is a pure function of
    * (id, seed) — change the seed string to re-shuffle per epoch,
    * keep it to reproduce a run bit-for-bit. Never `rand()`: a retry
    * or repartition cannot reorder the corpus.
    *
    * Scale: a narrow projection; the only data movement is the
    * shard-keyed exchange the shard WRITER needs anyway, and the hash
    * is uniform so shards are balanced by construction — no
    * range-boundary sampling pass, no skew. */
  def trainingOrder(
      docs: DataFrame,
      seed: String = "epoch0",
      numShards: Int = 1024,
      idCol: String = "doc_id"): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    docs
      // seed PREFIXES the id: a rolling hash diffuses early characters
      // through every later multiply, so any seed change re-permutes
      // the whole order. As a suffix it would only translate the keys
      // by a near-constant (seeds differing in one trailing character
      // shift every hash equally), which preserves the order — pinned
      // by EpochOrderSpec's re-shuffle test.
      .withColumn("sort_key", TextHash.text_hash(
        concat(lit(seed), lit("#ord"), col(idCol).cast("string"))))
      .withColumn("shard", pmod(col("sort_key"), lit(numShards.toLong)))
  }

  /** Token-budget mixture sampling: downsample each source toward a
    * per-source token budget, with the keep fraction DERIVED from the
    * data — `min(1, budget / source_tokens)` — instead of hand-tuned
    * ([[stratifiedSample]]'s fixed fractions). This is the "rebalance
    * the mixture" step: oversized sources shrink toward the budget,
    * undersized sources pass through whole.
    *
    * Exactly reproducible end to end: the per-source threshold is
    * integer arithmetic (`least(1e6, budget·1e6 div tokens)` — no
    * float rounding to diverge between engines) and membership is the
    * salted id-hash, so the SAME documents are kept on every run,
    * partitioning, and cluster size.
    *
    * Scale: one map-side-combined aggregate for per-source token
    * totals (sources ≪ corpus → broadcast), then one narrow filter.
    * The corpus is never shuffled. */
  def tokenBudgetSample(
      docs: DataFrame,
      budgetTokensPerSource: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    require(budgetTokensPerSource >= 0 && budgetTokensPerSource < (1L << 40),
      s"budget out of range: $budgetTokensPerSource")
    val perSrc = docs
      .groupBy(col(sourceCol))
      .agg(sum(TextAnalysis.tokenCount(col(textCol))).as("src_tokens"))
      .select(
        col(sourceCol),
        least(lit(1000000L),
          expr(s"${budgetTokensPerSource}L * 1000000L div src_tokens"))
          .as("keep_threshold"))
    val b = pmod(TextHash.text_hash(
      concat(col(idCol).cast("string"), lit("#budget"))), lit(1000000L))
    // null-safe equality: a NULL source is a real group (it got its own
    // threshold row from the groupBy above); a plain equi-join would
    // silently drop every NULL-source document at any budget
    val thr = perSrc.withColumnRenamed(sourceCol, "__graft_src")
    docs
      .join(broadcast(thr), col(sourceCol) <=> col("__graft_src"))
      .filter(b < col("keep_threshold"))
      .drop("keep_threshold", "__graft_src")
  }

  /** Temperature-weighted mixture sampling at α = 1/2: rebalance the
    * corpus so each source's token share moves from proportional
    * (`t_s / T`) toward uniform, the multilingual-sampling smoothing
    * (`p_s ∝ t_s^α`) used to keep big sources from drowning small
    * ones. α is fixed at 1/2 because `sqrt` is the one power IEEE-754
    * rounds correctly — both engines compute the identical integer
    * weight `w_s = floor(sqrt(share_ppm · 1e6))`, so the whole recipe
    * stays exact integer arithmetic and the SAME documents are kept on
    * every run, partitioning, and engine (membership is the salted
    * id-hash, as [[tokenBudgetSample]]).
    *
    * The integer recipe (per source s, all `Long`):
    * `share_ppm = t_s·1e6 div T` → `w = isqrt(share_ppm·1e6)` →
    * `target_s = budget·w div Σw` → `threshold = min(1e6,
    * target_s·1e6 div t_s)`; keep iff `hash(id#temp) mod 1e6 <
    * threshold`. Envelope: exact for `T < 2^43` tokens per aggregate
    * and `budget < 2^43` (products stay under 2^63); beyond that,
    * widen to decimal — the shape is unchanged.
    *
    * Scale: one map-side-combined per-source aggregate (sources ≪
    * corpus), a two-row-deep broadcast chain for `Σw`, then one
    * narrow filter — the corpus never shuffles. */
  def temperatureSample(
      docs: DataFrame,
      totalBudgetTokens: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame =
    applyTemperatureThresholds(
      docs,
      temperatureThresholds(docs, totalBudgetTokens, textCol, sourceCol),
      idCol, sourceCol)

  /** The model half of [[temperatureSample]]: the per-source keep
    * thresholds (ppm integers), one bounded row per source. Split out
    * so a STREAMING deployment can freeze the mixture recipe once at
    * setup ([[graft.streaming.Incremental.sampleVsFrozen]]) and each
    * micro-batch pays only the narrow membership filter. */
  def temperatureThresholds(
      docs: DataFrame,
      totalBudgetTokens: Long,
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    require(totalBudgetTokens >= 0 && totalBudgetTokens < (1L << 43),
      s"budget out of range: $totalBudgetTokens")
    val perSrc = docs
      .groupBy(col(sourceCol))
      .agg(sum(TextAnalysis.tokenCount(col(textCol))).as("src_tokens"))
    val total = perSrc.agg(
      sum(col("src_tokens")).as("total_tokens"))
    val weighted = perSrc
      .crossJoin(broadcast(total))
      .withColumn("share_ppm",
        expr("src_tokens * 1000000L div total_tokens"))
      // isqrt: sqrt is correctly rounded (IEEE) and the argument is
      // < 2^52, so floor(sqrt(double)) is the exact integer sqrt on
      // any conforming engine
      .withColumn("w",
        floor(sqrt((col("share_ppm") * lit(1000000L)).cast("double")))
          .cast("long"))
    val sumW = weighted.agg(sum(col("w")).as("sum_w"))
    weighted
      .crossJoin(broadcast(sumW))
      .withColumn("target_tokens",
        expr(s"${totalBudgetTokens}L * w div sum_w"))
      .select(
        col(sourceCol).as("__graft_src"),
        least(lit(1000000L),
          expr("target_tokens * 1000000L div src_tokens"))
          .as("keep_threshold"))
  }

  /** The membership half of [[temperatureSample]]: keep iff the
    * salted id-hash lands under the source's threshold — one
    * broadcast probe + narrow filter, the corpus never shuffles.
    * Works unchanged on a streaming frame (stream-static broadcast
    * join + filter, append mode, stateless). */
  def applyTemperatureThresholds(
      docs: DataFrame,
      thresholds: DataFrame,
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val b = pmod(TextHash.text_hash(
      concat(col(idCol).cast("string"), lit("#temp"))), lit(1000000L))
    docs
      .join(broadcast(thresholds), col(sourceCol) <=> col("__graft_src"))
      .filter(b < col("keep_threshold"))
      .drop("keep_threshold", "__graft_src")
  }

  /** Per-stratum deterministic downsample: keep ~`fraction` of each
    * stratum (e.g. language) using the same id-hash, so the sample is
    * reproducible and join-stable. One narrow filter — no shuffle. */
  /** Cap every source/domain at `maxDocs` documents — the C4/CCNet-
    * style domain cap that stops one giant site from dominating the
    * training mixture. Selection is DETERMINISTIC and repartition-
    * stable: each source keeps its `maxDocs` lowest documents by
    * `(text_hash(id‖"#cap"), id)` — a salted hash order, never
    * `rand()` — so re-processing a corpus keeps the same winners, and
    * the salt decorrelates the kept set from the split buckets and
    * the other samplers. Sources at or under the cap pass through
    * whole.
    *
    * Scale shape: NOT a per-source window rank — a window ships every
    * row of a giant source through one exchange partition (the skew
    * [[graft.llm.Curate.topQualityPerSource]] documents). Here the
    * winner ids come from the bounded `collect_top_k` heap aggregate:
    * ≤ `maxDocs` entries per (source, map task) cross the wire, so a
    * source with a billion rows costs its map-side heaps, not a
    * shuffle of a billion rows into one task. The kept-id frame
    * (≤ sources × maxDocs rows of (id) — tiny next to the corpus)
    * then semi-joins back; AQE broadcasts it whenever the source
    * count is bounded, and at web scale (millions of domains) it
    * degrades to one hash join keyed on the id — still skew-free. */
  def capPerSource(
      df: DataFrame,
      maxDocs: Int,
      sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be ≥ 1: $maxDocs")
    GraftFunctions.register(df.sparkSession)
    val keptIds = df
      .select(
        col(sourceCol).as("__src"),
        struct(
          TextHash.text_hash(
            concat(col(idCol).cast("string"), lit("#cap"))).as("h"),
          col(idCol).as("kid")).as("__e"))
      .groupBy("__src")
      .agg(TopKAgg.collect_top_k(col("__e"), maxDocs, reverse = true)
        .as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.kid").as(idCol))
    df.join(keptIds, Seq(idCol), "left_semi")
  }

  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      idCol: String = "doc_id"): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      s"fractions must be in [0,1]: $fractions")
    GraftFunctions.register(df.sparkSession)
    // decorrelate from the split buckets: salt the id before hashing
    val b = pmod(TextHash.text_hash(
      concat(col(idCol).cast("string"), lit("#strat"))), lit(10000L))
    val keep = fractions.foldLeft(lit(false)) { case (acc, (k, f)) =>
      acc || (col(strataCol) === k && b < (f * 10000).toInt)
    }
    df.filter(keep)
  }

  /** Water-filling mixture allocation: split a global token budget
    * across sources proportionally to a weight, but never allocate a
    * source more than it HAS — the surplus of saturated sources
    * refills the unsaturated ones (the budget-planning step
    * [[temperatureThresholds]] skips: its proportional targets
    * silently under-spend the budget when a small source can't absorb
    * its share). Weight = the α=1/2 temperature weight
    * (`isqrt(share_ppm·10⁶)` — the exact-integer recipe from
    * [[temperatureThresholds]]), so over-crawled sources still can't
    * dominate the refill.
    *
    * Contract (deterministic, greedy-prefix — the standard
    * water-filling fixed point, expressed statically): sort sources
    * by `(avail·10⁶ div w) ASC, source ASC`; source i is SATURATED iff
    * every source before it is saturated and
    * `(B − PA_{i−1}) · w_i div (W − PW_{i−1}) ≥ avail_i`, with PA/PW
    * the prefix sums of saturated avail/weight in that order —
    * saturating in order accumulates exactly those prefix sums, so
    * the greedy loop and this static rule coincide (and the rule is
    * one window pass in SQL, which is what the oracle runs).
    * Saturated sources get `alloc = avail`; the rest get
    * `(B − PA_k) · w div (W − PW_k)` (floor division; the ≤ S-token
    * remainder stays unallocated by design). All arithmetic is Long
    * and overflow-free by the budget/weight bounds.
    *
    * Scale shape: ONE map-side-combined per-source aggregate over the
    * corpus; the plan itself runs on the DRIVER over the ≤|sources|
    * collected rows (mixture planning is a driver-side decision over
    * bounded per-source state, like the Lloyd centroids) and returns
    * a local frame `(source, avail_tokens, weight, alloc_tokens,
    * saturated)`. */
  def mixturePlan(
      docs: DataFrame,
      totalBudgetTokens: Long,
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    require(totalBudgetTokens >= 0 && totalBudgetTokens < (1L << 40),
      s"budget out of range: $totalBudgetTokens")
    val spark = docs.sparkSession
    val perSrc = docs
      .groupBy(col(sourceCol))
      .agg(sum(TextAnalysis.tokenCount(col(textCol))).as("avail"))
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse(""), r.getLong(1)))
    import spark.implicits._
    if (perSrc.isEmpty)
      return Seq.empty[(String, Long, Long, Long, Boolean)]
        .toDF(sourceCol, "avail_tokens", "weight", "alloc_tokens",
          "saturated")
    val total = perSrc.map(_._2).sum
    require(total < (1L << 43), s"corpus token total out of range: $total")
    val rows = perSrc.map { case (s, a) =>
      val sharePpm = if (total > 0) a * 1000000L / total else 0L
      // floor-at-1 guards the ratio sort's division for zero-share
      // sources (temperatureThresholds never divides by w, so it
      // needs no floor)
      val w = math.max(1L, math.sqrt((sharePpm * 1000000L).toDouble).toLong)
      (s, a, w)
    }
    val sorted = rows.sortBy { case (s, a, w) => (a * 1000000L / w, s) }
    val wTotal = sorted.map(_._3).sum
    var pa = 0L
    var pw = 0L
    var prefixHolds = true
    val marked = sorted.map { case (s, a, w) =>
      val remW = wTotal - pw
      val sat = prefixHolds && remW > 0 &&
        (totalBudgetTokens - pa) * w / remW >= a
      if (sat) { pa += a; pw += w } else prefixHolds = false
      (s, a, w, sat)
    }
    val remB = totalBudgetTokens - pa
    val remW = wTotal - pw
    marked.map { case (s, a, w, sat) =>
      val alloc = if (sat) a else if (remW > 0) remB * w / remW else 0L
      (s, a, w, alloc, sat)
    }.toSeq
      .toDF(sourceCol, "avail_tokens", "weight", "alloc_tokens",
        "saturated")
  }
}
