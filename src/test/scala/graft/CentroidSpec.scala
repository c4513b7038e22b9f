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

  test("kmeansLloyd recovers two planted direction clusters") {
    // ids 0,1 seed the two clusters; the rest split 4/3 between the
    // x-ish and y-ish directions — after 2 Lloyd rounds the profile
    // must report exactly that split with high within-cluster cosine
    val docs = Seq(
      (0L, Array(1f, 0.05f, 0f)),
      (1L, Array(0.05f, 1f, 0f)),
      (2L, Array(2f, 0.1f, 0.1f)),
      (3L, Array(5f, 0.2f, 0f)),
      (4L, Array(0.9f, 0.1f, 0.05f)),
      (5L, Array(0.1f, 3f, 0.1f)),
      (6L, Array(0f, 0.8f, 0.05f))).toDF("vec_id", "embedding")
    val prof = Similarity.kmeansLloyd(docs, k = 2, iters = 2)
      .collect()
    assert(prof.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(prof.map(_.getLong(1)).toSeq == Seq(4L, 3L))
    assert(prof.forall(_.getDouble(2) > 0.95))
  }

  test("kmeansLloyd with iters=0 profiles the raw lowest-id init") {
    val prof = Similarity.kmeansLloyd(corpus, k = 2, iters = 0).collect()
    // same memberships as fixedCentroidAssign on the same corpus:
    // 3 vectors on centroid 0, 2 on centroid 1
    assert(prof.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 3L, 1L -> 2L))
  }

  test("kmeansLloyd: duplicate init vectors exercise the empty-cluster keep") {
    // ids 0 and 1 are identical → round-1 assignment ties everything
    // to cid 0, so the round-1 UPDATE sees cluster 1 empty and must
    // keep its previous centroid (the kept centroid may then win rows
    // back once cluster 0's centroid moves — legitimate Lloyd
    // dynamics, so only conservation is pinned, not the split).
    val tied = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(1f, 0f)),
      (2L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val prof = Similarity.kmeansLloyd(tied, k = 2, iters = 2).collect()
    assert(prof.map(_.getLong(1)).sum == 3L)
    assert(prof.map(_.getLong(0)).forall(Set(0L, 1L)))
  }

  test("kmeansLloyd on an empty corpus returns an empty, well-typed frame") {
    val empty = corpus.filter(col("vec_id") < 0)
      .select("vec_id", "embedding")
    val prof = Similarity.kmeansLloyd(empty, k = 3, iters = 2)
    assert(prof.columns.toSeq == Seq("cluster_id", "n_vecs", "avg_cos"))
    assert(prof.count() == 0)
  }

  test("kmeansBalancedSample keeps the most prototypical members up to the cap") {
    // x-direction cluster has 4 members (ids 0,2,3,4 by construction
    // below), y-direction has 3; cap=2 must keep exactly 2 per
    // cluster, and for the x cluster the 2 HIGHEST-cosine ids
    val docs = Seq(
      (0L, Array(1f, 0f)), // seed cluster 0
      (1L, Array(0f, 1f)), // seed cluster 1
      (2L, Array(1f, 0.01f)),
      (3L, Array(1f, 0.3f)), // least x-aligned of the x group
      (4L, Array(1f, 0.02f)),
      (5L, Array(0.02f, 1f)),
      (6L, Array(0.3f, 1f))).toDF("vec_id", "embedding")
    val got = Similarity.kmeansBalancedSample(
      docs, k = 2, iters = 1, maxPerCluster = 2).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(got.map(_.getLong(1)).toSeq == Seq(4L, 3L)) // n_vecs
    assert(got.map(_.getLong(2)).toSeq == Seq(2L, 2L)) // n_kept
    // kept membership matches an exhaustive per-cluster rank by
    // (cos DESC, id): recompute from the assignment surface
    val byRank = Similarity.kmeansAssign(docs, k = 2, iters = 1)
      .collect()
      .groupBy(_.getLong(1))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(r => (-r.getDouble(2), r.getLong(0)))
          .take(2).map(_.getLong(0)).sum
      }
    assert(got.map(r => r.getLong(0) -> r.getLong(3)).toMap == byRank)
  }

  test("kmeansBalancedSample with a loose cap keeps everything") {
    val got = Similarity.kmeansBalancedSample(
      corpus, k = 2, iters = 2, maxPerCluster = 100).collect()
    assert(got.map(_.getLong(1)).sum == 5L)
    assert(got.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("ivfTrainedTopK returns a planted exact copy as top-1 through the probe") {
    // the copy of the query vector assigns to the query's own best
    // list (identical cosines to every centroid), which is always the
    // first probed list — must come back top-1 at cosine 1
    val emb = corpus.select("vec_id", "embedding")
    val withCopy = emb.unionByName(
      emb.filter(col("vec_id") === 0L)
        .select(lit(1000L).as("vec_id"), col("embedding")))
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_vec"))
    val got = Similarity.ivfTrainedTopK(withCopy, query, k = 1,
      nlist = 2, iters = 1, nprobe = 1, excludeId = 0L).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 1000L)
    assert(got.head.getDouble(1) == 1.0)
  }

  test("ivfTrainedTopK with all lists probed equals brute force") {
    val emb = corpus.select("vec_id", "embedding")
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_vec"))
    val ivf = Similarity.ivfTrainedTopK(emb, query, k = 3, nlist = 2,
      iters = 2, nprobe = 2, excludeId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bf = Similarity.bruteForceTopK(emb, query, k = 3, excludeId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == bf)
  }
}
