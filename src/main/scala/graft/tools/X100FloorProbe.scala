package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry, Tables}

/** Decomposition of the x100 per-query floor (r15 verdict ask #2):
  * `a1_count` and `a5_topk_group` read 0.38–0.42 s warm at the x100
  * tier — 37–40× DuckDB's metadata-served answers — and the
  * "scheduling floor" narrative has been load-bearing for three
  * rounds without a measurement. This probe times the pieces once:
  *
  *   - `sched_32task`: an empty 32-task RDD job — the pure
  *     scheduler round-trip any 32-partition stage pays;
  *   - `plan_only`: building + analyzing + optimizing the a1 plan
  *     with no execution (fresh DataFrame each sample, Bench's shape);
  *   - `exec_same_df`: re-executing ONE prepared DataFrame (plan
  *     reuse — what a resident engine with a plan cache would pay);
  *   - `exec_fresh_df`: fresh plan + execution (what Bench measures);
  *   - `pure_count_range`: count over `spark.range(n)` — codegen'd
  *     counting with no cache read, isolating the cached-batch scan;
  *   - the same breakdown for a5 (group-agg family, 2 AQE stages).
  *
  * Run: `sbt "runMain graft.tools.X100FloorProbe [sfDir [mult]]"`.
  * Findings recorded in SCALE_PROBES.md (r16).
  */
object X100FloorProbe {

  private def timed(b: => Unit): Double = {
    val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9
  }

  private def best(n: Int)(b: => Unit): Double =
    (1 to n).map(_ => timed(b)).min

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(100)
    val dir = graft.Bench.ensureScaledFixture(spark, sfDir, mult)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    // Bench's x100 posture: base tables cached + materialized
    Seq("lineitem", "customer").foreach { n =>
      Tables.load(spark, dir, n).cache().count()
    }

    // scheduler floor: empty 32-task job, nothing else
    best(3)(spark.sparkContext.parallelize(0 until 32, 32).count())
    val tSched = best(5)(
      spark.sparkContext.parallelize(0 until 32, 32).count())
    println(f"PROBE x100_floor sched_32task min_sec=$tSched%.4f")

    val queries = SparkEntry.queries
    for (name <- Seq("a1_count", "a5_topk_group")) {
      val rows = Tables.load(spark, dir,
        if (name == "a1_count") "lineitem" else "customer").count()
      // plan only: fresh build + force analysis/optimization/physical
      queries(name)(spark, dir).queryExecution.executedPlan
      val tPlan = best(5)(
        queries(name)(spark, dir).queryExecution.executedPlan)
      // plan-reuse execution: same DataFrame object, repeated
      val prepared = queries(name)(spark, dir)
      prepared.count() // warm
      val tSame = best(5)(prepared.count())
      // fresh plan + execution (Bench's per-sample shape)
      val tFresh = best(5)(queries(name)(spark, dir).count())
      println(f"PROBE x100_floor $name rows=$rows " +
        f"plan_only=$tPlan%.4f exec_same_df=$tSame%.4f " +
        f"exec_fresh_df=$tFresh%.4f")
    }

    // pure counting floor with no cache involved: codegen over range
    val n = Tables.load(spark, dir, "lineitem").count()
    best(2)(spark.range(n).agg(count(lit(1))).count())
    val tRange = best(5)(spark.range(n).agg(count(lit(1))).count())
    println(f"PROBE x100_floor pure_count_range n=$n min_sec=$tRange%.4f")

    spark.stop()
  }
}
