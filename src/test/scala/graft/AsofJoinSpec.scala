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

  test("NULL build keys never match (SQL join semantics)") {
    val p = Seq((1L, null.asInstanceOf[String], 10L), (2L, "u1", 20L))
      .toDF("pid", "k", "t")
    val b = Seq((null.asInstanceOf[String], 5L, 42.0), ("u1", 5L, 7.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(p, "k", "t", b, "k", "t", Seq("v"))
      .select("pid", "v").as[(Long, Option[Double])].collect().sortBy(_._1)
    // NULL-key probe row survives (left-join style) but must NOT pick
    // up the NULL-key build payload
    assert(out === Array((1L, None), (2L, Some(7.0))))
  }

  test("payload/matchedTs name collisions with probe are rejected eagerly") {
    val e1 = intercept[IllegalArgumentException] {
      // "t" is a probe column and a payload name
      AsofJoin.asofJoin(probe, "k", "t", build, "k", "t", Seq("t"))
    }
    assert(e1.getMessage.contains("collide"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(probe, "k", "t", build, "k", "t", Seq("v"),
        matchedTsAs = Some("pid"))
    }
    assert(e2.getMessage.contains("collide"))
  }

  test("bucketed variant agrees with the plain as-of join, hot key included") {
    // one hot key (u1) with many rows across a wide t range, plus the
    // regular fixture rows — bucket width 25 splits u1 across buckets
    val hotProbe = (0 until 500).map(i => (1000L + i, "u1", i.toLong * 2))
      .toDF("pid", "k", "t").union(probe)
    val hotBuild = (0 until 100).map(i => ("u1", i.toLong * 10, i.toDouble, i.toLong))
      .toDF("k", "t", "v", "tie").union(build)
    val plain = AsofJoin
      .asofJoin(hotProbe, "k", "t",
        AsofJoin.dedupeBuild(hotBuild, "k", "t", Seq("v"), "tie"),
        "k", "t", Seq("v"), Some("mt"))
    val bucketed = AsofJoin
      .asofJoinBucketed(hotProbe, "k", "t",
        AsofJoin.dedupeBuild(hotBuild, "k", "t", Seq("v"), "tie"),
        "k", "t", Seq("v"), Some("mt"))(t => t.divide(25).cast("long"))
    assert(plain.count() === 505)
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
    // the big window really is per (key, bucket): its partition spec
    // carries two expressions, so a hot key cannot serialize
    val w = bucketed.queryExecution.optimizedPlan.collect {
      case win: org.apache.spark.sql.catalyst.plans.logical.Window
          if win.partitionSpec.size == 2 => win
    }
    assert(w.nonEmpty, bucketed.queryExecution.optimizedPlan.toString)
  }

  test("bucketed carry-in crosses empty buckets") {
    // build only in bucket 0; probes in far-later buckets must still
    // see the carry (forward-fill across empty buckets)
    val p = Seq((1L, "u1", 1000L), (2L, "u1", 5000L)).toDF("pid", "k", "t")
    val b = Seq(("u1", 1L, 3.5)).toDF("k", "t", "v")
    val out = AsofJoin
      .asofJoinBucketed(p, "k", "t", b, "k", "t", Seq("v"), Some("mt"))(
        t => t.divide(10).cast("long"))
      .select("pid", "v", "mt").as[(Long, Option[Double], Option[Long])]
      .collect().sortBy(_._1)
    assert(out === Array((1L, Some(3.5), Some(1L)), (2L, Some(3.5), Some(1L))))
  }

  test("random equivalence with a brute-force reference (plain + bucketed)") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 4) {
      // Small domains on purpose: force key collisions, exact ts ties
      // (probe==build and build==build), NULL keys, and keys present
      // on only one side.
      val keys = Array("a", "b", "c", null)
      val probeRows = Seq.tabulate(60)(i =>
        (i.toLong, keys(rnd.nextInt(keys.length)), rnd.nextInt(40).toLong))
      val buildRows = Seq.tabulate(50)(i =>
        (keys(rnd.nextInt(keys.length)), rnd.nextInt(40).toLong,
          rnd.nextDouble(), i.toLong))
      val probeDf = probeRows.toDF("pid", "k", "t")
      val buildDf = AsofJoin.dedupeBuild(
        buildRows.toDF("k", "t", "v", "tie"), "k", "t", Seq("v"), "tie")

      // brute force: per probe row, the max-ts build row at-or-before,
      // ties on (k, ts) resolved to the max-tiebreak payload
      val byKey = buildRows.filter(_._1 != null).groupBy(_._1)
      val expect = probeRows.map { case (pid, k, t) =>
        val cands = Option(k).flatMap(byKey.get).getOrElse(Seq.empty)
          .filter(_._2 <= t)
        val best =
          if (cands.isEmpty) None
          else {
            val maxT = cands.map(_._2).max
            Some(cands.filter(_._2 == maxT).maxBy(_._4)._3)
          }
        pid -> best
      }.toMap

      val plain = AsofJoin
        .asofJoin(probeDf, "k", "t", buildDf, "k", "t", Seq("v"))
        .select("pid", "v").as[(Long, Option[Double])].collect().toMap
      assert(plain == expect, s"plain as-of diverged in round $round")

      val bucketed = AsofJoin
        .asofJoinBucketed(probeDf, "k", "t", buildDf, "k", "t", Seq("v")) {
          tsCol => (tsCol / lit(8L)).cast("long")
        }
        .select("pid", "v").as[(Long, Option[Double])].collect().toMap
      assert(bucketed == expect, s"bucketed as-of diverged in round $round")
    }
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
