package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: at 100 TB the PLAN is the product. Each
  * assertion pins a property that keeps a query viable at 1000
  * executors; a regression here is a scale bug even when results stay
  * correct at sf0.01. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("filters reach the parquet scan (PushedFilters)") {
    val p = plan("p6_predicates")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(p_size,10)") ||
      p.contains("In(p_brand"), s"predicates not pushed:\n$p")
  }

  test("projection prunes the scan schema (ReadSchema)") {
    val p = plan("o1_topk_order")
    // only the two selected columns are read, not all six
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"scan reads more than the projection:\n$p")
  }

  test("top-k plans as TakeOrderedAndProject, never a global sort") {
    for (q <- Seq("o1_topk_order", "a5_topk_group", "a6_date_topk",
        "ann_cosine_topk")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q lacks top-k plan:\n$p")
    }
  }

  test("w1 runs the bounded heap, not a window sort") {
    // the exchange must carry <=k rows per (segment, map task): the
    // plan is an ObjectHashAggregate over collect_top_k with a partial
    // phase below the exchange — never a Window/WindowGroupLimit,
    // which sorts every map partition in full before its limit
    val p = plan("w1_topk_per_group")
    assert(p.contains("ObjectHashAggregate") && p.contains("collect_top_k"),
      s"w1 lost the heap aggregate:\n$p")
    assert(!p.contains("Window") && !p.contains("WindowGroupLimit"),
      s"w1 regressed to a window sort:\n$p")
  }

  test("a6 formats dates per group, never per fact row") {
    // date_format over every fact row is the regression: the grouping
    // key must be the 4-byte day int (cast to date), with the string
    // render only in the Aggregate's result expressions (runs once per
    // group; Catalyst collapses the post-agg Project into them)
    val opt = SparkEntry.queries("a6_date_topk")(spark, sf)
      .queryExecution.optimizedPlan
    val agg = opt.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.getOrElse(fail(s"no Aggregate in:\n$opt"))
    assert(agg.groupingExpressions.forall(
      _.dataType == org.apache.spark.sql.types.DateType),
      s"grouping key is not the day int:\n$opt")
    assert(agg.child.expressions.forall(
      e => !e.toString.contains("date_format")),
      s"date_format runs below the aggregate (per fact row):\n$opt")
  }

  test("dimension joins broadcast; no shuffle of the fact side") {
    for (q <- Seq("j1_join_broadcast", "j2_join_3way", "w1_topk_per_group")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q not broadcasting:\n$p")
    }
    // j2's fact⋈fact side must stay a shuffle join (the at-scale shape):
    // broadcasting orders only works at toy SF and would OOM at 100 TB.
    val p2 = plan("j2_join_3way")
    assert(p2.contains("ShuffledHashJoin"),
      s"j2 fact⋈fact is not a shuffled hash join:\n$p2")
  }

  test("null-safe dim join broadcasts (no shuffle of the fact side)") {
    val p = plan("j8_nullsafe_join")
    assert(p.contains("BroadcastHashJoin"), s"j8 not broadcasting:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"<=> degenerated to a non-equi plan:\n$p")
  }

  test("j2b: bucketed fact join plans with NO Exchange on either fact side") {
    val df = SparkEntry.queries("j2b_bucketed_3way")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"j2b lost the merge join:\n$p")
    // the FACT join must not shuffle: no Exchange keyed on either join
    // key (the post-join groupBy(c_mktsegment) exchange is a few-row
    // aggregate and is supposed to be there)
    assert(!"Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
      .findFirstIn(p).isDefined,
      s"bucketed fact join still shuffles:\n$p")
    assert(p.contains("Bucketed: true"), s"scan is not bucket-aware:\n$p")
    // layout must change the plan, never the rows: j2b ≡ j2 row for row
    val j2 = SparkEntry.queries("j2_join_3way")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(df.collect().map(_.toString).toSeq == j2)
  }

  test("full-outer sides pre-aggregate BEFORE the join") {
    // the partial aggregates must sit below the join: the shuffle then
    // carries one row per user, not one per event
    val p = plan("j7_full_outer")
    val joinAt = p.indexOf("FullOuter")
    assert(joinAt >= 0, s"j7 lost its full-outer join:\n$p")
    val below = p.substring(joinAt)
    assert(below.contains("HashAggregate"),
      s"aggregation happens above the join — shuffle carries raw events:\n$p")
  }

  test("contamination joins on the shingle key with a broadcast bench side") {
    val p = plan("llm_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"bench shingles must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"contamination degenerated to doc×doc:\n$p")
  }

  test("bloom semi join probes the sketch below the exchange") {
    val p = plan("j9_bloom_semi")
    assert(p.contains("bloom_might_contain"),
      s"bloom probe filter missing from the plan:\n$p")
    // the probe-side prune must run BEFORE any exchange: in the plan
    // string (printed top-down), the lineitem-side Exchange (or the
    // broadcast build for the exact join) appears ABOVE the filter —
    // so the bloom_might_contain line must come after the last
    // exchange-introducing operator on its path. Cheap proxy: the
    // filter text appears below the (single) semi-join operator and
    // no Exchange sits between the filter and its InMemory/FileScan.
    val lines = p.linesIterator.toSeq
    val fIdx = lines.indexWhere(_.contains("bloom_might_contain"))
    assert(fIdx >= 0)
    val below = lines.drop(fIdx + 1)
      .takeWhile(l => !l.contains("Scan parquet") &&
        !l.contains("InMemoryTableScan"))
    assert(!below.exists(l => l.contains("Exchange")),
      s"an Exchange sits between the bloom filter and the probe scan " +
        s"— pruning happens after a shuffle:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"bloom one-row frame degenerated to a cartesian:\n$p")
  }

  test("heavy hitters filters candidates below the aggregation exchange") {
    val p = plan("a20_heavy_hitters")
    assert(p.contains("cm_estimate"),
      s"count-min candidate filter missing:\n$p")
    val lines = p.linesIterator.toSeq
    val fIdx = lines.indexWhere(_.contains("cm_estimate"))
    val below = lines.drop(fIdx + 1)
      .takeWhile(l => !l.contains("Scan parquet") &&
        !l.contains("InMemoryTableScan"))
    assert(!below.exists(_.contains("Exchange")),
      s"candidate filter runs after a shuffle — the long tail is " +
        s"being shuffled anyway:\n$p")
  }

  test("no CartesianProduct anywhere in the LSH/ANN paths") {
    for (q <- Seq("ann_lsh_topk", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_embedding_cosine")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q degenerated to an all-pairs product:\n$p")
    }
  }

  test("LSH self-join computes the banding once on the big-data path") {
    // The shingle frame and the capped band list are persisted inside
    // nearDupMinhash, so the expensive passes (tokenize+shingle, the
    // 64-hash minhash banding) each run exactly once — at cache
    // materialization. In the FINAL plan no LIVE banding node may
    // remain: every minhashbands occurrence must be part of an
    // InMemoryRelation's cached-plan printout (unstarred), never a
    // whole-stage-codegen'd `*(n) Generate` executing per join side.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      df.collect() // materialize so AQE finalizes the plan
      // the adaptive plan prints Final + Initial sections; judge the
      // final one only
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // exactly ONE banding node, and it must live INSIDE the band
      // cache's InMemoryRelation printout (i.e. below that line in the
      // tree dump) — a live per-join-side Generate would appear before
      // any InMemoryRelation, and a second occurrence means the cache
      // was bypassed on one side
      val bandings = "minhashbands".r.findAllIn(p).length
      val bandIdx = p.indexOf("minhashbands")
      val cacheIdx = """InMemoryRelation \[id#\d+L?, band#""".r
        .findFirstMatchIn(p).map(_.start).getOrElse(Int.MaxValue)
      assert(bandings == 1 && cacheIdx < bandIdx,
        s"banding must run once, at band-cache build ($bandings " +
          s"occurrence(s), cache@$cacheIdx vs banding@$bandIdx):\n" + p)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed as-of join: no cartesian, no per-key serialization") {
    val p = plan("j6b_asof_bucketed")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the main window must partition by (key, bucket), not key alone
    assert(p.contains("__graft_asof_bkt"), p)
  }

  test("brute-force ANN broadcasts the query vector (single-row side)") {
    val p = plan("ann_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
  }

  test("partial aggregation before the shuffle (map-side combine)") {
    val p = plan("a2_groupby_count")
    // two HashAggregate nodes around one Exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Exchange hashpartitioning"), p)
  }

  test("EXISTS subquery rewrites to a semi join, not a nested loop") {
    val p = plan("sq1_exists_subquery")
    assert(p.contains("LeftSemi"), s"EXISTS did not become a semi join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"EXISTS planned as a per-row loop:\n$p")
  }

  test("TPC-H Q3: broadcast dim, top-10 as TakeOrderedAndProject") {
    val p = plan("tpch_q3")
    assert(p.contains("BroadcastHashJoin"), s"customer dim not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-10 is a global sort:\n$p")
  }

  test("pivot with explicit values plans a single aggregate, no distinct scan") {
    // One scan only: pivot values are fixed at plan time, so no extra
    // job runs to discover the pivot column's domain.
    val p = plan("pv1_pivot")
    assert("Scan parquet".r.findAllIn(p).size == 1, s"pivot re-scans input:\n$p")
  }

  test("whole-stage codegen covers the custom expressions") {
    // AQE reveals the final (codegen-staged) plan only after execution
    val df = SparkEntry.queries("dedup_simhash")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" node prefix = inside WholeStageCodegen stage n
    assert(p.contains("*(2) Project") || p.contains("*(1) Project"), p)
    assert(p.contains("simhash64"), p)
  }
}
