package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.QuantileSketches

/** KLL quantile-sketch laws: the rank-error contract (the only thing
  * callers may rely on — compaction randomizes the estimate), merge
  * soundness across bucketings/partitionings, empty-input behavior,
  * and the persisted-table round trip. */
class KllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rankOf(sorted: IndexedSeq[Double], v: Double): Double =
    sorted.count(_ <= v).toDouble / sorted.size

  test("rank-error contract holds, merged across buckets and partitionings") {
    // deterministic skewed data: squares modulo a prime, 20k values
    val vals = (1 to 20000).map(i => ((i.toLong * i) % 9973).toDouble)
    val sorted = vals.sorted.toIndexedSeq
    val df = vals.zipWithIndex
      .map { case (v, i) => (i % 7, v) }.toDF("b", "v")
      .repartition(13)
    val sketches = QuantileSketches.sketchPerBucket(df, "b", "v")
    assert(sketches.count() == 7)
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val est = QuantileSketches.rangeQuantiles(sketches, qs)
      .as[(Double, Double)].collect().toMap
    for (q <- qs) {
      val r = rankOf(sorted, est(q))
      assert(math.abs(r - q) <= 0.05,
        s"rank(${est(q)}) = $r too far from $q")
    }
  }

  test("sketch of empty input yields NULL quantiles, not an error") {
    val empty = Seq.empty[(Int, Double)].toDF("b", "v")
    val est = QuantileSketches.rangeQuantiles(
      QuantileSketches.sketchPerBucket(empty, "b", "v"), Seq(0.5))
    val row = est.collect()
    // no input rows → merge of zero sketches → empty sketch → NULL
    assert(row.length == 1 && row.head.isNullAt(1))
  }

  test("nulls are skipped like every Spark aggregate") {
    val df = Seq[(Int, java.lang.Double)](
      (1, 1.0), (1, null), (1, 3.0)).toDF("b", "v")
    val est = QuantileSketches.rangeQuantiles(
        QuantileSketches.sketchPerBucket(df, "b", "v"), Seq(1.0))
      .as[(Double, Double)].head()
    assert(est._2 == 3.0)
  }

  test("persisted sketch table round-trips and answers range queries") {
    val dir = java.nio.file.Files.createTempDirectory("kllsk").toString
    val df = (1 to 1000).map(i => (i % 5, i.toDouble)).toDF("day", "v")
    QuantileSketches.writeSketchTable(df, "day", "v", dir)
    val est = QuantileSketches.rangeQuantilesFromTable(
        spark, dir, col("bucket") < 100, Seq(0.5))
      .as[(Double, Double)].head()
    // median of 1..1000 within rank tolerance
    assert(math.abs(est._2 - 500.0) <= 0.05 * 1000)
  }

  test("small sketches are exact (n below compaction threshold)") {
    val df = (1 to 100).map(d => (1, d.toDouble)).toDF("b", "v")
    val est = QuantileSketches.rangeQuantiles(
        QuantileSketches.sketchPerBucket(df, "b", "v"),
        Seq(0.01, 0.5, 1.0))
      .as[(Double, Double)].collect().toMap
    assert(est(1.0) == 100.0 && est(0.01) == 1.0)
    assert(math.abs(est(0.5) - 50.0) <= 1.0)
  }

  test("SQL surface resolves via Spark's native KLL functions") {
    (1 to 50).map(i => i.toDouble).toDF("v")
      .createOrReplaceTempView("kll_probe")
    val out = spark.sql(
      """SELECT kll_sketch_get_quantile_double(
           kll_sketch_agg_double(v), CAST(1.0 AS DOUBLE)) AS m
         FROM kll_probe""").as[Double].head()
    assert(out == 50.0)
  }
}
