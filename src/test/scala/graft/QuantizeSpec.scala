package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Quantize

class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed quantization: codes, scale, and errors") {
    val embs = Seq((1L, Array(1.0f, -0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.int8Quantize(embs)
      .select("vec_id", "scale", "q")
      .as[(Long, Double, Seq[Byte])].head()
    assert(q._1 == 1L)
    assert(math.abs(q._2 - 1.0 / 127.0) < 1e-15)
    // round(-63.5) ties away from zero -> -64; round(31.75) -> 32
    assert(q._3 == Seq[Byte](127, -64, 32))

    val p = Quantize.int8Profile(embs)
      .as[(Long, Double, Double, Double)].head()
    // worst element is -0.5: |(-0.5) - (-64/127)| = 0.5/127
    assert(math.abs(p._3 - 0.5 / 127.0) < 1e-9)
  }

  test("reconstruction error is bounded by scale/2 on real vectors") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val bad = Quantize.int8Profile(embs)
      .filter(col("max_abs_err") > col("scale") / 2 + lit(1e-9))
    assert(bad.isEmpty)
  }

  test("an all-zero vector quantizes to zeros with scale 0, no NaN") {
    val embs = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Quantize.int8Quantize(embs)
      .select("scale", "q").as[(Double, Seq[Byte])].head()
    assert(q._1 == 0.0 && q._2 == Seq[Byte](0, 0))
    val p = Quantize.int8Profile(embs)
      .as[(Long, Double, Double, Double)].head()
    assert(p._2 == 0.0 && p._3 == 0.0 && p._4 == 0.0)
  }

  test("metadata columns pass through int8Quantize") {
    val embs = Seq((1L, Array(1.0f), "news"))
      .toDF("vec_id", "embedding", "label")
    val cols = Quantize.int8Quantize(embs).columns.toSet
    assert(cols == Set("vec_id", "label", "scale", "q"))
  }

  test("quantization plan is shuffle-free") {
    val embs = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val plan = Quantize.int8Profile(embs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
