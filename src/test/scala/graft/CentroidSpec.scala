package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

class CentroidSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // axis-aligned corpus: ids 0,1 are the centroids (lowest ids);
  // 2,3 align with centroid 0; 4 aligns with centroid 1
  private def corpus = Seq(
    (0L, Array(1f, 0f, 0f), 0),
    (1L, Array(0f, 1f, 0f), 1),
    (2L, Array(2f, 0.1f, 0f), 0),
    (3L, Array(5f, 0f, 0.1f), 0),
    (4L, Array(0.1f, 3f, 0f), 1)).toDF("vec_id", "embedding", "label")

  test("fixedCentroidAssign sends each vector to its nearest low-id centroid") {
    val got = Similarity.fixedCentroidAssign(corpus, k = 2)
      .select("vec_id", "centroid_id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("a centroid assigns to itself with cosine 1") {
    val self = Similarity.fixedCentroidAssign(corpus, k = 2)
      .filter(col("vec_id") === 0L)
      .select("cos_to_centroid").as[Double].head()
    assert(self == 1.0)
  }

  test("cosine ties break to the lower centroid id") {
    val tied = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(1f, 0f), 0), // identical to centroid 0 → tie
      (2L, Array(1f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val got = Similarity.fixedCentroidAssign(tied, k = 2)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(0L))
  }

  test("profile sizes and avg_norm are exact on the hand corpus") {
    val prof = Similarity.fixedCentroidProfile(corpus, k = 2)
      .orderBy("centroid_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(prof.map(p => p._1 -> p._2) == Seq(0L -> 3L, 1L -> 2L))
  }

  test("hardNegatives only returns label-mismatched neighbors, ranked") {
    val queries = corpus.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val got = Similarity.hardNegatives(queries, corpus, k = 5)
      .orderBy("rank")
      .select("vec_id", "label", "rank")
      .as[(Long, Int, Int)].collect().toSeq
    // only label!=0 rows: ids 1 and 4; id 4 has the higher cosine to
    // (1,0,0) than the orthogonal id 1
    assert(got.map(_._1) == Seq(4L, 1L))
    assert(got.forall(_._2 == 1))
    assert(got.map(_._3) == Seq(1, 2))
  }

  test("hardNegatives caps at k per query") {
    val many = (0L to 20L).map(i =>
      (i, Array(1f, i.toFloat / 20f), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val queries = many.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val got = Similarity.hardNegatives(queries, many, k = 4)
    assert(got.count() == 4)
    assert(got.filter(col("label") === 0).count() == 0)
  }
}
