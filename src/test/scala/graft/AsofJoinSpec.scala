package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** AsofJoin: semantics (inclusive last-at-or-before, per key, NULL
  * when nothing qualifies), determinism via dedupeBuild, and the plan
  * shape (one shuffle, no CartesianProduct / range-join blowup). */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def probe =
    Seq((1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 5L),
      (4L, "u2", 100L), (5L, "u3", 50L))
      .toDF("pid", "k", "t")

  private def build =
    Seq(("u1", 10L, 1.0, 1L), ("u1", 15L, 2.0, 2L),
      ("u2", 99L, 3.0, 3L), ("u2", 101L, 4.0, 4L))
      .toDF("k", "t", "v", "tie")

  test("picks the last build row at-or-before each probe ts, per key") {
    val out = AsofJoin
      .asofJoin(probe, "k", "t", build, "k", "t", Seq("v"), Some("mt"))
      .select("pid", "v", "mt").as[(Long, Option[Double], Option[Long])]
      .collect().sortBy(_._1)
    assert(out === Array(
      (1L, Some(1.0), Some(10L)),   // inclusive: t=10 matches t=10
      (2L, Some(2.0), Some(15L)),   // last of {10,15} ≤ 20
      (3L, None, None),             // t=5 precedes every build row
      (4L, Some(3.0), Some(99L)),   // 101 > 100 excluded
      (5L, None, None)))            // key u3 absent from build
  }

  test("probe columns all survive, build ts name collision is fine") {
    val out = AsofJoin
      .asofJoin(probe, "k", "t", build.withColumnRenamed("t", "t2"),
        "k", "t2", Seq("v"))
    assert(out.columns.toSeq === Seq("pid", "k", "t", "v"))
    assert(out.count() === 5)
  }

  test("dedupeBuild makes tied build timestamps deterministic") {
    val dup = build.union(
      Seq(("u1", 15L, 9.0, 7L)).toDF("k", "t", "v", "tie"))
    val deduped = AsofJoin.dedupeBuild(dup, "k", "t", Seq("v"), "tie")
    assert(deduped.count() === 4)
    val out = AsofJoin
      .asofJoin(probe, "k", "t", deduped, "k", "t", Seq("v"))
      .filter($"pid" === 2L).select("v").as[Double].head()
    assert(out === 9.0) // arg-max by tie: 7L beats 2L
  }

  test("mismatched ts types are rejected eagerly") {
    val bad = build.withColumn("t", $"t".cast("int"))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(probe, "k", "t", bad, "k", "t", Seq("v"))
    }
    assert(e.getMessage.contains("cast one side"))
  }

  test("plan is one shuffle + window — no join operator at all") {
    val out = AsofJoin
      .asofJoin(probe, "k", "t", build, "k", "t", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Window"), plan)
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly 1 hash exchange:\n$plan")
  }

  test("j6_asof_join query runs and click rows are preserved 1:1") {
    val df = SparkEntry.queries("j6_asof_join")(spark, TestSpark.sf0001)
    val ev = Tables.events(spark, TestSpark.sf0001)
    val nClicks = ev.filter($"event_type" === "click").count()
    assert(df.count() === nClicks)
    // at least one click has a preceding purchase and at least one not
    val withMatch = df.filter($"purchase_val".isNotNull).count()
    assert(withMatch > 0 && withMatch < nClicks)
  }
}
