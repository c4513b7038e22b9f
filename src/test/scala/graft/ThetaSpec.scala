package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.ThetaSketches

/** Theta sketch laws: exact mode below the retained-entry budget,
  * the intersection estimate's tolerance contract in estimation
  * mode, merge across bucketings/partitionings, persisted-table
  * round trip, and empty-side behavior. */
class ThetaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact mode: small overlap recovered exactly, any partitioning") {
    // keys 0..999 in bucket A, 500..1499 in bucket B → overlap 500
    val df = ((0 until 1000).map(k => ("a", k.toLong)) ++
      (500 until 1500).map(k => ("b", k.toLong)))
      .toDF("bucket_src", "user")
      .repartition(11)
    val sk = ThetaSketches.sketchPerBucket(df, "bucket_src", "user")
    val est = ThetaSketches.overlapEstimate(
        sk, col("bucket") === "a", col("bucket") === "b")
      .as[Double].head()
    assert(est == 500.0, s"exact-mode overlap must be exact: $est")
  }

  test("estimation mode: overlap within 5% beyond the entry budget") {
    // 60k vs 60k keys with 30k overlap — past lgK=14's ~16k budget
    val df = ((0 until 60000).map(k => ("a", k.toLong)) ++
      (30000 until 90000).map(k => ("b", k.toLong)))
      .toDF("bucket_src", "user")
    val sk = ThetaSketches.sketchPerBucket(df, "bucket_src", "user")
    val est = ThetaSketches.overlapEstimate(
        sk, col("bucket") === "a", col("bucket") === "b")
      .as[Double].head()
    assert(math.abs(est - 30000.0) <= 1500.0,
      s"estimate $est outside 5% of 30000")
  }

  test("disjoint sides estimate zero overlap") {
    val df = ((0 until 100).map(k => ("a", k.toLong)) ++
      (1000 until 1100).map(k => ("b", k.toLong)))
      .toDF("bucket_src", "user")
    val sk = ThetaSketches.sketchPerBucket(df, "bucket_src", "user")
    val est = ThetaSketches.overlapEstimate(
        sk, col("bucket") === "a", col("bucket") === "b")
      .as[Double].head()
    assert(est == 0.0)
  }

  test("persisted table round-trips; union across many buckets") {
    val dir = java.nio.file.Files.createTempDirectory("thetask").toString
    // 10 daily buckets; days 0-4 carry keys 0..499, days 5-9 keys
    // 250..749 → overlap 250
    val df = (0 until 10).flatMap(day =>
      (0 until 100).map(i => (day, (day / 5) * 250L + day % 5 * 100 + i)))
      .toDF("day", "user")
    ThetaSketches.writeSketchTable(df, "day", "user", dir)
    val est = ThetaSketches.overlapFromTable(
        spark, dir, col("bucket") < 5, col("bucket") >= 5)
      .as[Double].head()
    val exact = {
      val a = df.filter($"day" < 5).select("user").distinct()
      val b = df.filter($"day" >= 5).select("user").distinct()
      a.join(b, Seq("user"), "left_semi").count()
    }
    assert(est == exact.toDouble, s"exact-mode table overlap: $est vs $exact")
  }
}
