package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomExprs.{bloom_agg, bloom_might_contain}
import graft.functions.GraftFunctions

/** Bloom-pruned joins — the runtime-filter shape for 100 TB facts.
  *
  * A plain `probe ⋈ build` (or semi/anti) shuffles every probe row on
  * the join key, including the overwhelming majority that match
  * nothing when the build side is selective. Here the build side is
  * first collapsed to a kilobyte-scale bit-set sketch (one aggregate;
  * wordwise-OR merge keeps it map-side partial), the sketch is
  * inlined as a scalar into the probe filter, and the probe scan
  * drops cannot-match rows inside whole-stage codegen BEFORE any
  * exchange (see `prune` for why a scalar, not a broadcast frame).
  * The exact join over the survivors restores exact semantics: a
  * Bloom filter has no false negatives, so
  * `semiJoin(probe, build) ≡ probe LEFT SEMI JOIN build` row-for-row
  * — which is what lets the gate oracle-check this operator against
  * a plain IN-subquery.
  *
  * This composes where `broadcast(build)` does not: the sketch is
  * ~10 bits/key where a hashed relation is ~50-100 bytes/key, so a
  * 100M-key build side (a 5-10 GB broadcast — undeliverable) is a
  * ~125 MB bloom, and the post-prune join can stay shuffle-based at
  * full exactness. Spark's own `InjectRuntimeFilter` applies the same
  * idea opportunistically; this operator is the explicit, always-on
  * form with controlled sizing.
  */
object BloomJoin {

  /** Build a one-row (binary) bloom frame over `build`'s key. */
  def buildFilter(
      build: DataFrame,
      buildKey: String,
      numBits: Int,
      k: Int): DataFrame =
    build.agg(
      bloom_agg(xxhash64(col(buildKey)), numBits, k).as("__graft_bloom"))

  /** Drop probe rows whose key cannot be in `build` (no false
    * negatives; survivors are a superset of true matches).
    *
    * The sketch is materialized to the driver as the one-row scalar it
    * is (kilobytes at dimension scale — the driver never sees build
    * ROWS, only the aggregated bit-set) and inlined as a literal in
    * the probe filter. This is deliberate, not a collect() smell: a
    * broadcast one-row frame + crossJoin puts the membership test in
    * a join condition, and Catalyst's PushDownLeftSemiAntiJoin then
    * reorders the EXACT join below it — running the full join first
    * and the "prune" after (observed; pinned in PlanSpec). A literal
    * in a plain Filter sits immediately above the probe scan inside
    * whole-stage codegen, below every exchange, which is the entire
    * point of the operator. Spark ships the plan (sketch included) to
    * executors once per stage via the task-binary broadcast. */
  def prune(
      probe: DataFrame,
      probeKey: String,
      bloomFrame: DataFrame,
      k: Int): DataFrame = {
    GraftFunctions.register(probe.sparkSession)
    val sketch = bloomFrame.head().getAs[Array[Byte]]("__graft_bloom")
    probe.filter(
      bloom_might_contain(lit(sketch), xxhash64(col(probeKey)), k))
  }

  private def sized(expectedItems: Long, fpp: Double): (Int, Int) = {
    val m = graft.functions.BloomExprs.optimalNumBits(expectedItems, fpp)
    (m, graft.functions.BloomExprs.optimalK(m, expectedItems))
  }

  /** Exact LEFT SEMI with bloom pre-prune. `expectedItems` sizes the
    * filter (pass the build side's approximate key count — an
    * overestimate only wastes bits, an underestimate only raises the
    * false-positive rate; correctness is unaffected either way). */
  def semiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val (m, k) = sized(expectedItems, fpp)
    val pruned = prune(probe, probeKey, buildFilter(build, buildKey, m, k), k)
    pruned.join(
      build.select(col(buildKey).as(probeKey)),
      Seq(probeKey), "left_semi")
  }

  /** Exact LEFT ANTI: the bloom keeps MAYBE-matching rows for the
    * exact anti join and passes definite non-matches straight through
    * — both legs are exact, the union is the plain anti join. The
    * anti join's input shrinks from |probe| to |maybe-matches|
    * (≈ |true matches| + fpp·|probe|). */
  def antiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    GraftFunctions.register(probe.sparkSession)
    val (m, k) = sized(expectedItems, fpp)
    val sketch = buildFilter(build, buildKey, m, k)
      .head().getAs[Array[Byte]]("__graft_bloom")
    val tagged = probe
      .withColumn("__graft_maybe", bloom_might_contain(
        lit(sketch), xxhash64(col(probeKey)), k))
    val definiteMiss = tagged
      .filter(!col("__graft_maybe")).drop("__graft_maybe")
    val maybe = tagged
      .filter(col("__graft_maybe")).drop("__graft_maybe")
    definiteMiss.unionByName(
      maybe.join(
        build.select(col(buildKey).as(probeKey)),
        Seq(probeKey), "left_anti"))
  }

  /** Inner equi-join with bloom pre-prune on the probe side (build
    * side joined in full afterwards — exact). */
  def innerJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val (m, k) = sized(expectedItems, fpp)
    val pruned = prune(probe, probeKey, buildFilter(build, buildKey, m, k), k)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}
