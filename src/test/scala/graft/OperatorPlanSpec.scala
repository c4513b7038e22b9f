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
    val p = plan("dedup_incremental")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the exact phase's digest anti-join is present
    assert(p.contains("LeftAnti"), s"expected a left_anti phase:\n${p.take(2000)}")
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

  test("composed pipeline: exactly one LSH banding pass in the plan") {
    val p = plan("pipeline_curate_split")
    // minhash_bands appears once per distinct subtree; the audit's
    // fix (stage flags, single aggregate) must keep it to ≤2 mentions
    // (the self-join's two sides reference the same exchange)
    val n = "minhash_bands".r.findAllIn(p).size
    assert(n <= 2, s"LSH banding recomputed $n times:\n${p.take(3000)}")
  }
}
