package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ProfileQueries
import graft.sources.JsonApi

/** Error-path behavior (reference test_permissions.py analog):
  * missing inputs fail fast and explicitly; sketchy inputs degrade
  * gracefully. */
class ErrorPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("discover on a nonexistent root returns empty, not an error") {
    assert(JsonApi.discover(spark, "/root/repo/target/does-not-exist").isEmpty)
  }

  test("readRaw with no directories fails fast with a clear message") {
    val e = intercept[IllegalArgumentException] {
      JsonApi.readRaw(spark, Seq.empty)
    }
    assert(e.getMessage.contains("no input directories"))
  }

  test("convert on an empty tree fails fast") {
    val empty = TestSpark.tmpDir("empty-tree")
    val e = intercept[IllegalArgumentException] {
      graft.cli.Main.run(spark, Array("convert", empty))
    }
    assert(e.getMessage.contains("no dockets found"))
  }

  test("approx distinct within the configured rsd of exact") {
    val exact = SparkEntry.queries("a7_distinct")(spark, TestSpark.sf0001)
      .head().getAs[Long]("n_cust").toDouble
    val approx = SparkEntry.queries("a7x_approx_distinct")(
      spark, TestSpark.sf0001).head().getAs[Long]("approx_cust").toDouble
    assert(math.abs(approx - exact) / exact < 0.15,
      s"approx $approx vs exact $exact")
  }

  test("profile handles a single-column and an empty-result table") {
    import spark.implicits._
    val one = Seq(1, 2, 2, 3).toDF("x")
    val got = ProfileQueries.profile(one).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_nonnull") == 4)
    assert(got.head.getAs[Long]("n_distinct") == 3)
    val empty = ProfileQueries.profile(one.filter($"x" > 100)).collect()
    assert(empty.head.getAs[Long]("n_nonnull") == 0)
  }
}
