package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for every probe row, attach the payload of the
  * single build row with the greatest timestamp ≤ the probe timestamp
  * within the same key (the "last known value" join of time-series
  * engines; DuckDB spells it `ASOF JOIN`).
  *
  * Spark has no built-in as-of join, and the naive formulations do not
  * scale: a range-condition join plans a CartesianProduct-with-filter
  * (O(n·m) per key), and a correlated `LIMIT 1` subquery is not
  * supported in joins at all. This implementation is the union+window
  * composition:
  *
  *   1. union probe and build rows into one stream, tagged by side
  *      (build=0, probe=1), with the build payload packed in a struct
  *      that is NULL on probe rows;
  *   2. one window pass per key ordered by (ts, side):
  *      `last(payload, ignoreNulls=true)` over rows
  *      UNBOUNDED PRECEDING..CURRENT ROW picks exactly the latest
  *      build payload at-or-before each probe row — build sorts before
  *      probe at equal ts, so `>=` (inclusive) semantics hold;
  *   3. keep probe rows, unpack the struct.
  *
  * Scale design: the whole operator is ONE shuffle (hash partition by
  * key for the window sort) over probe+build — the same cost class as
  * a shuffled equi-join, with no per-key quadratic blowup. Both inputs
  * are pruned to (key, ts, payload) before the union, so the shuffle
  * never carries unused columns. A hot key (one user with millions of
  * events) serializes into one window partition — at that point
  * pre-aggregate the build side per (key, ts) (see `dedupeBuild`)
  * and/or bucket the probe side by time range before joining.
  *
  * Determinism: if multiple build rows share (key, ts), `last()` picks
  * the final one in sort order, which is ambiguous. Callers that need
  * a deterministic result pre-aggregate with `dedupeBuild` (arg-max by
  * a tiebreak column) — exactly what a SQL oracle must also do.
  */
object AsofJoin {

  /** Collapse build rows to one per (key, ts): payload of the row with
    * the max tiebreak value. Makes the as-of result deterministic. */
  def dedupeBuild(
      build: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String],
      tiebreakCol: String): DataFrame = {
    val aggs = payloadCols.map(c =>
      max_by(col(c), col(tiebreakCol)).as(c))
    build.groupBy(col(keyCol), col(tsCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Left as-of join (inclusive: build.ts ≤ probe.ts).
    *
    * @param probe        left side; all its columns survive
    * @param probeKeyCol  equi-key on the probe side
    * @param probeTsCol   probe timestamp column (any orderable type)
    * @param build        right side (must be unique per (key, ts) for a
    *                     deterministic result — see [[dedupeBuild]])
    * @param buildKeyCol  equi-key on the build side
    * @param buildTsCol   build timestamp column
    * @param payloadCols  build columns to attach to matching probe rows
    * @param matchedTsAs  if set, also attach the matched build ts under
    *                     this name (NULL when no build row qualifies)
    */
  def asofJoin(
      probe: DataFrame,
      probeKeyCol: String,
      probeTsCol: String,
      build: DataFrame,
      buildKeyCol: String,
      buildTsCol: String,
      payloadCols: Seq[String],
      matchedTsAs: Option[String] = None): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    val key = "__graft_asof_key"
    val ts = "__graft_asof_ts"
    val side = "__graft_asof_side"
    val payload = "__graft_asof_payload"

    require(
      probe.schema(probeTsCol).dataType == build.schema(buildTsCol).dataType,
      s"as-of ts types must match: probe $probeTsCol is " +
        s"${probe.schema(probeTsCol).dataType.simpleString}, build " +
        s"$buildTsCol is ${build.schema(buildTsCol).dataType.simpleString}" +
        " — cast one side before joining")
    val collisions =
      (payloadCols ++ matchedTsAs.toSeq).intersect(probe.columns.toSeq)
    require(collisions.isEmpty,
      s"as-of output columns ${collisions.mkString(", ")} collide with " +
        "probe columns — alias the probe side (or matchedTsAs) first, " +
        "or downstream by-name selects become ambiguous")
    val probeCols = probe.columns.toSeq
    // SQL join semantics: NULL keys never match — a NULL-key build row
    // must not become the "last known value" of NULL-key probe rows
    // (Window.partitionBy would otherwise group them together).
    // NULL-key probe rows survive with a NULL match, like a left join.
    val buildPruned = build
      .filter(col(buildKeyCol).isNotNull)
      .select(
        col(buildKeyCol).as(key),
        col(buildTsCol).as(ts),
        lit(0).as(side),
        struct(col(buildTsCol).as("__ts") +: payloadCols.map(col): _*)
          .as(payload))

    val probeTagged = probe.select(
      (probeCols.map(col) :+
        col(probeKeyCol).as(key)) :+
        col(probeTsCol).as(ts) :+
        lit(1).as(side) :+
        lit(null).cast(buildPruned.schema(payload).dataType).as(payload): _*)

    val unioned = probeTagged.unionByName(buildPruned,
      allowMissingColumns = true)

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__graft_asof_match",
        last(col(payload), ignoreNulls = true).over(w))
      .filter(col(side) === 1)

    val out = payloadCols.map(c =>
      col(s"__graft_asof_match.$c").as(c)) ++
      matchedTsAs.map(n => col("__graft_asof_match.__ts").as(n)).toSeq
    matched.select(probeCols.map(col) ++ out: _*)
  }

  /** Skew-safe as-of join: identical semantics to [[asofJoin]], but the
    * window runs per (key, time-bucket) instead of per key, so a hot
    * key (one user with millions of events) parallelizes across its
    * buckets instead of serializing into one window partition.
    *
    * Mechanics — the classic two-level forward-fill:
    *   1. collapse build rows to the latest payload per (key, bucket);
    *   2. forward-fill those across buckets with one window over the
    *      per-bucket rows only (at most keys × buckets rows — tiny
    *      relative to the data, and the only per-key sequential pass);
    *   3. inject each bucket's carry-in as a synthetic row that sorts
    *      before everything in the bucket (NULL ts, asc_nulls_first),
    *      then run the [[asofJoin]] union+window per (key, bucket).
    *
    * `bucket` must be monotone non-decreasing in the timestamp and
    * identical for both sides (e.g. `date_trunc("day", _)` or
    * `unix_micros(_) div width`). Bucket choice only affects
    * parallelism, never results — but granularity matters for the
    * carry pass: step 2 runs over one row per DISTINCT (key, bucket),
    * so a bucket fn that is too fine (worst case: `unix_micros(_) /
    * width`, which is DOUBLE division and gives every row its own
    * bucket) degrades the carry window back to per-key row counts.
    * Pick buckets so each holds many rows (hours/days, not µs).
    */
  def asofJoinBucketed(
      probe: DataFrame,
      probeKeyCol: String,
      probeTsCol: String,
      build: DataFrame,
      buildKeyCol: String,
      buildTsCol: String,
      payloadCols: Seq[String],
      matchedTsAs: Option[String] = None)(
      bucket: Column => Column): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    require(
      probe.schema(probeTsCol).dataType == build.schema(buildTsCol).dataType,
      s"as-of ts types must match: probe $probeTsCol vs build $buildTsCol")
    val collisions =
      (payloadCols ++ matchedTsAs.toSeq).intersect(probe.columns.toSeq)
    require(collisions.isEmpty,
      s"as-of output columns ${collisions.mkString(", ")} collide with " +
        "probe columns — alias the probe side (or matchedTsAs) first")
    val key = "__graft_asof_key"
    val ts = "__graft_asof_ts"
    val bkt = "__graft_asof_bkt"
    val side = "__graft_asof_side"
    val payload = "__graft_asof_payload"
    val probeCols = probe.columns.toSeq

    val buildB = build
      .filter(col(buildKeyCol).isNotNull)
      .select(
        col(buildKeyCol).as(key),
        col(buildTsCol).as(ts),
        bucket(col(buildTsCol)).as(bkt),
        struct(col(buildTsCol).as("__ts") +: payloadCols.map(col): _*)
          .as(payload))

    // 1. latest build payload per (key, bucket)
    val lastPerBucket = buildB
      .groupBy(col(key), col(bkt))
      .agg(max_by(col(payload), col(ts)).as(payload))

    // 2. forward-fill across buckets: carry-in for bucket b = latest
    // payload of any earlier bucket. Runs over per-bucket rows only.
    // Probe-side buckets participate too — a probe bucket with no
    // build rows still needs the carry from earlier buckets.
    val allBuckets = probe
      .filter(col(probeKeyCol).isNotNull)
      .select(col(probeKeyCol).as(key), bucket(col(probeTsCol)).as(bkt))
      .distinct()
      .unionByName(lastPerBucket.select(col(key), col(bkt)))
      .distinct()
    val wCarry = Window.partitionBy(col(key)).orderBy(col(bkt).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = allBuckets
      .join(lastPerBucket, Seq(key, bkt), "left")
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(wCarry))
      .filter(col(payload).isNotNull)
      .select(
        col(key),
        lit(null).cast(build.schema(buildTsCol).dataType).as(ts),
        col(bkt),
        lit(-1).as(side),
        col(payload))

    // 3. per-(key, bucket) union+window; carry rows sort first
    // (NULL ts + asc_nulls_first), build (0) before probe (1) at
    // equal ts for inclusive `>=` semantics.
    val probeTagged = probe.select(
      probeCols.map(col) ++ Seq(
        col(probeKeyCol).as(key),
        col(probeTsCol).as(ts),
        bucket(col(probeTsCol)).as(bkt),
        lit(1).as(side),
        lit(null).cast(buildB.schema(payload).dataType).as(payload)): _*)
    val unioned = probeTagged
      .unionByName(buildB.withColumn(side, lit(0)),
        allowMissingColumns = true)
      .unionByName(carries, allowMissingColumns = true)

    val w = Window.partitionBy(col(key), col(bkt))
      .orderBy(col(ts).asc_nulls_first, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__graft_asof_match",
        last(col(payload), ignoreNulls = true).over(w))
      .filter(col(side) === 1)

    val out = payloadCols.map(c =>
      col(s"__graft_asof_match.$c").as(c)) ++
      matchedTsAs.map(n => col("__graft_asof_match.__ts").as(n)).toSeq
    matched.select(probeCols.map(col) ++ out: _*)
  }
}
