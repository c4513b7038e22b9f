package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DistinctSketches

class DistinctSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = Tables.events(spark, TestSpark.sf0001)
    .withColumn("day", to_date($"ts"))

  test("sketch-table range estimate tracks exact distinct") {
    val dir = TestSpark.tmpDir("sketch-table")
    DistinctSketches.writeSketchTable(events, "day", "user_id", dir)
    val est = DistinctSketches.estimateRange(
      spark, dir, col("bucket").between("2024-01-02", "2024-01-09"))
    val exact = events
      .filter($"day".between("2024-01-02", "2024-01-09"))
      .agg(countDistinct($"user_id")).head().getLong(0)
    assert(math.abs(est - exact) <= math.max(1L, exact * 15 / 100),
      s"estimate $est vs exact $exact")
    assert(exact > 0)
  }

  test("appending a new bucket extends the range without a rebuild") {
    val dir = TestSpark.tmpDir("sketch-append")
    val day1 = events.filter($"day" === "2024-01-02")
    val day2 = events.filter($"day" === "2024-01-03")
    DistinctSketches.writeSketchTable(day1, "day", "user_id", dir)
    val before = DistinctSketches.estimateRange(
      spark, dir, col("bucket").between("2024-01-02", "2024-01-03"))
    DistinctSketches.writeSketchTable(
      day2, "day", "user_id", dir, mode = "append")
    val after = DistinctSketches.estimateRange(
      spark, dir, col("bucket").between("2024-01-02", "2024-01-03"))
    val exact = events
      .filter($"day".between("2024-01-02", "2024-01-03"))
      .agg(countDistinct($"user_id")).head().getLong(0)
    assert(after >= before)
    assert(math.abs(after - exact) <= math.max(1L, exact * 15 / 100),
      s"post-append estimate $after vs exact $exact")
  }

  test("sketch binaries survive the parquet round-trip unchanged") {
    val dir = TestSpark.tmpDir("sketch-roundtrip")
    val inMem = DistinctSketches
      .sketchPerBucket(events, "day", "user_id")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))"))
      .head().getLong(0)
    DistinctSketches.writeSketchTable(events, "day", "user_id", dir)
    val persisted = DistinctSketches.estimateRange(spark, dir, lit(true))
    assert(inMem == persisted,
      s"parquet round-trip changed the estimate: $inMem vs $persisted")
  }
}
