package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audits for the composed operators (gap-fill, upsert,
  * curation pipeline): the claims their scaladocs make about shuffles
  * and joins, pinned against the physical plan. */
class OperatorPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString

  test("gap-fill: no join operator, no cartesian — union+window only") {
    val p = plan("st_gapfill_hourly")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("Generate"), s"grid should be a Generate:\n$p")
  }

  test("upsert merge: single window on the key, no join") {
    val p = plan("m1_upsert_merge")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"merge must be union+window, not a join:\n$p")
  }

  test("incremental dedup: bucket-keyed joins only, never a cartesian") {
    // the registered query is the (eagerly computed) audit row, whose
    // final plan is a literal projection — pin the kept-rows plan from
    // the operator itself instead
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val kept = graft.llm.Dedup.incrementalDedup(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0))
    val p = kept.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the exact phase's digest anti-join AND the near-phase drop
    // anti-join are both present
    assert(p.contains("LeftAnti"), s"expected a left_anti phase:\n${p.take(2000)}")
  }

  test("leakage-safe split: label assignment broadcasts, never shuffles the corpus") {
    // labels come out of an iterative computation with no Catalyst
    // size stats; the explicit broadcast hint in leakageSafeSplit must
    // survive to the physical plan (otherwise the full corpus sort-
    // merge-shuffles against a tiny label set)
    val p = plan("split_leakage_safe")
    assert(p.contains("BroadcastHashJoin"),
      s"labels join must be a broadcast hash join:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must not shuffle against the label set:\n${p.take(3000)}")
  }

  test("OOV audit: the vocab probe is a broadcast join, not a shuffle join") {
    val p = plan("text_oov_by_source")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      s"bounded vocab must broadcast:\n${p.take(2000)}")
  }

  test("PSI drift: sides collapse map-side; only broadcast stat frames cross") {
    val p = plan("drift_numeric_psi")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"bin counts must partial-aggregate:\n${p.take(2000)}")
  }

  test("composed pipeline: no live LSH banding in the final plan") {
    // the near-dup drop list is eagerly materialized inside curate()
    // (nearDupPairsMaterialized), so the final plan must consume a
    // checkpointed id list — zero live banding nodes; a nonzero count
    // means the pipeline went back to recomputing the LSH pass at
    // action time
    val p = plan("pipeline_curate_split")
    val n = "minhash_bands".r.findAllIn(p).size
    assert(n == 0, s"LSH banding still live in the plan ($n):\n${p.take(3000)}")
  }

  /** The final per-query window of the k-NN family must rank the
    * bounded collect_top_k output, never the raw |corpus|×|queries|
    * scored frame: the tree prints top-down, so the Window node has
    * to sit ABOVE the aggregate, and the map side must carry a
    * partial_collect_top_k (k-sized heap per query per task — ≤ k
    * entries per (query, map task) through the exchange). */
  private def assertBoundedKnnWindow(p: String): Unit = {
    assert(p.contains("partial_collect_top_k"),
      s"map-side bounded heap missing:\n${p.take(3000)}")
    val w = p.indexOf("Window")
    val a = p.indexOf("ObjectHashAggregate")
    val j = p.indexOf("BroadcastNestedLoopJoin")
    assert(w >= 0 && a >= 0 && j >= 0, s"expected window/agg/join:\n${p.take(3000)}")
    assert(w < a && a < j,
      s"window must consume the aggregate, which consumes the scored join:\n${p.take(3000)}")
  }

  test("knn join: window ranks the bounded top-k aggregate, not the scored frame") {
    assertBoundedKnnWindow(plan("ann_knn_join"))
  }

  test("hard negatives: window ranks the bounded top-k aggregate, not the scored frame") {
    assertBoundedKnnWindow(plan("ann_hard_negatives"))
  }
}
