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
