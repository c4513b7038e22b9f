package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanLint
import graft.tools.PlanLint.{Error, Finding, Warn}

class PlanLintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rules(findings: Seq[Finding]): Set[String] =
    findings.map(_.rule).toSet

  test("flags a cartesian product as Error") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(0, 1000).toDF("x")
      val b = spark.range(0, 1000).toDF("y")
      val f = PlanLint.lint(a.crossJoin(b))
      assert(f.exists(x => x.rule == "cartesian" && x.severity == Error))
      intercept[IllegalStateException] {
        PlanLint.assertClean(a.crossJoin(b))
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("flags an unpartitioned window as Error") {
    val df = spark.range(0, 100).toDF("x")
      .withColumn("rn", row_number().over(Window.orderBy($"x")))
    assert(rules(PlanLint.lint(df)).contains("global-window"))
  }

  test("flags a single-partition exchange as Warn") {
    val df = spark.range(0, 100).toDF("x").repartition(1)
    assert(PlanLint.lint(df)
      .exists(f => f.rule == "single-partition-exchange" &&
        f.severity == Warn))
  }

  test("counts shuffles") {
    val df = spark.range(0, 100).toDF("x").groupBy($"x" % 7).count()
    val f = PlanLint.lint(df)
    assert(f.exists(_.rule == "shuffle-count"))
  }

  test("flags Generate over a heavyweight inline array as Warn") {
    // the winnowPairs trap: a non-trivial array pipeline inlined into
    // the explode — re-evaluates with the generator. Build an array
    // expression comfortably over GenerateInlineMax nodes.
    val docs = Seq((1L, "a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")
    val toks = split($"text", " ")
    val heavy = (0 until 24).foldLeft(toks) { (acc, i) =>
      transform(acc, x => concat(x, lit(i.toString)))
    }
    val trapped = docs.select($"doc_id", explode(heavy).as("t"))
    assert(PlanLint.lint(trapped)
      .exists(f => f.rule == "generate-inline-array" && f.severity == Warn),
      PlanLint.lint(trapped).mkString("\n"))
    // the fixed shape: explode over a STAGED column attribute (behind
    // a barrier) carries no inline tree — no finding
    val staged = docs.select($"doc_id", heavy.as("arr"))
      .localCheckpoint(true)
      .select($"doc_id", explode($"arr").as("t"))
    assert(!PlanLint.lint(staged)
      .exists(_.rule == "generate-inline-array"),
      PlanLint.lint(staged).mkString("\n"))
  }

  test("flags a HOF lambda over a big lambda-invariant subtree as Warn") {
    // the ngrams/winnowing trap: transform(seq, i => f(bigExpr, i))
    // inlines bigExpr into the lambda — one full evaluation per
    // ELEMENT. Input built over range() (a local Seq would be
    // constant-folded into a LocalTableScan, expression and all).
    val docs = spark.range(5).select($"id".as("doc_id"),
      concat_ws(" ", lit("a b c"), $"id".cast("string"),
        lit("e f g h")).as("text"))
    val toks = split($"text", " ")
    val big = (0 until 10).foldLeft(toks) { (acc, _) =>
      reverse(array_distinct(concat(acc, acc)))
    }
    val trapped = docs.select($"doc_id",
      transform(sequence(lit(1), size(toks)),
        i => element_at(big, i)).as("out"))
    assert(PlanLint.lint(trapped)
      .exists(f => f.rule == "hof-outer-reference" && f.severity == Warn),
      PlanLint.lint(trapped).mkString("\n"))
    // argument position evaluates once per row — no finding
    val fixedShape = docs.select($"doc_id",
      zip_with(big, toks, (a, b) => concat(a, b)).as("out"))
    assert(!PlanLint.lint(fixedShape)
      .exists(_.rule == "hof-outer-reference"),
      PlanLint.lint(fixedShape).mkString("\n"))
  }

  test("cheap per-element generators and lambdas stay quiet") {
    // scoreBigram's shape: explode of a small transform over an
    // attribute — legitimate, must not warn
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val toks = split($"text", " ")
    val bigrams = docs
      .select($"doc_id", toks.as("tk"))
      .select($"doc_id", explode(transform(
        sequence(lit(0), size($"tk") - 2),
        i => struct(
          element_at($"tk", i + 1).as("w1"),
          element_at($"tk", i + 2).as("w2")))).as("bg"))
    val f = PlanLint.lint(bigrams)
      .filter(x => x.rule == "generate-inline-array" ||
        x.rule == "hof-outer-reference")
    assert(f.isEmpty, f.mkString("\n"))
  }

  test("every registered engine query lints clean at Error level") {
    // the product guarantee: nothing the engine ships plans a
    // cluster-killer shape. Warn-level findings are allowed (bounded
    // broadcast cross joins in the ANN family are deliberate).
    val qs = SparkEntry.queries
    val offenders = qs.keys.toSeq.sorted.flatMap { name =>
      val findings =
        PlanLint.lint(qs(name)(spark, TestSpark.sf0001))
          .filter(_.severity == Error)
      if (findings.isEmpty) None else Some(name -> findings)
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, fs) => s"$n -> ${fs.mkString("; ")}" }
        .mkString("\n"))
  }

  test("clean broadcast join yields no Error/Warn findings") {
    val fact = Tables.orders(spark, TestSpark.sf0001)
    val dim = Tables.customer(spark, TestSpark.sf0001)
    val df = fact.join(broadcast(dim),
        $"o_custkey" === $"c_custkey")
      .groupBy("c_mktsegment").count()
    val f = PlanLint.lint(df).filterNot(_.rule == "shuffle-count")
    assert(f.isEmpty, f.mkString("\n"))
  }
}
