package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Curate

class CurateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val good = "the quick brown fox jumps over the lazy dog and it is a fine day in the park for everyone to enjoy themselves outside"

  lazy val docs = Seq(
    (1L, good),
    (2L, good), // exact dup → dropped
    (3L, good.replace("fine", "good")), // near dup → dropped
    (4L, "@@@ ## !! %% ^^ && ** (( ))"), // junk → quality gate
    (5L, "ok"), // too short
    (6L, "completely different quality content about the spark engine and the many ways it is used for data work today by the teams")
  ).toDF("doc_id", "text")

  // one changed word in a 22-word doc ≈ Jaccard 0.74 on 3-shingles
  val cfg = Curate.Config(nearDupJaccard = 0.7)

  test("curate composes dedup + quality + length gates") {
    val out = Curate.curate(docs, cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 6L))
  }

  test("near-dup threshold is honored") {
    val loose = Curate.curate(docs,
      Curate.Config(nearDupJaccard = 0.999))
      .select("doc_id").as[Long].collect().toSet
    assert(loose == Set(1L, 3L, 6L)) // near-dup survives a 0.999 bar
  }

  test("language gate filters on predicted language") {
    val en = Curate.curate(docs, cfg.copy(langs = Seq("en")))
      .select("doc_id").as[Long].collect().toSet
    assert(en == Set(1L, 6L))
    val es = Curate.curate(docs, cfg.copy(langs = Seq("es")))
    assert(es.count() == 0)
  }

  test("audit counts are monotone non-increasing") {
    val audit = Curate.auditCounts(docs, cfg)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit("input") == 6)
    assert(audit("after_exact_dedup") == 5)
    assert(audit("curated") == 2)
  }

  test("curate on the fixture corpus keeps the bulk, drops planted dups") {
    val corpus = Tables.documents(spark, TestSpark.sf0001)
    val curated = Curate.curate(corpus, Curate.Config(minQuality = 0.0))
    val n = curated.count()
    assert(n > 400 && n < 500) // planted near-dups removed, bulk kept
    // provenance columns present
    assert(curated.columns.contains("quality"))
    assert(curated.columns.contains("lang_pred"))
  }

  test("per-source quality gate keeps the best n of each source") {
    import graft.llm.TextAnalysis
    val srcDocs = Seq(
      // 'web': 3 docs of descending quality (longer = better here)
      (1L, "the cat sat on the mat and it was good for a while", "web"),
      (2L, "the dog ran", "web"),
      (3L, "zz", "web"),
      // 'books': 1 doc — sources under n pass through whole
      (10L, "a single book paragraph of reasonable length", "books")
    ).toDF("doc_id", "text", "source")
    val kept = Curate.topQualityPerSource(srcDocs, n = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(10L))
    assert((kept - 10L).size == 2)
    // the two kept web docs are the two highest-quality ones
    val q = srcDocs
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .filter(col("source") === "web")
      .orderBy(col("q").desc, col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    assert(kept - 10L == q.take(2).toSet, s"kept $kept, ranked $q")
  }

  test("quality grid: cells partition the corpus; totals conserved") {
    import graft.llm.TextAnalysis
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val grid = Curate.qualityGrid(docs).collect()
    assert(grid.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val totalToks = docs
      .select(TextAnalysis.tokenCount(col("text"))).as[Long].collect().sum
    assert(grid.map(_.getAs[Long]("sum_tokens")).sum == totalToks)
    grid.foreach { r =>
      val d = r.getAs[Int]("q_decile")
      assert(d >= 0 && d <= 9, s"decile $d out of range")
      val b = r.getAs[Long]("len_bucket")
      assert((b & (b - 1)) == 0L, s"bucket $b not a power of two")
    }
  }

  test("coverage audit: matched rows, orphans, and id-sum fingerprints") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (7L, "d"))
      .toDF("doc_id", "text")
    val embs = Seq((1L, Array(0.1f)), (2L, Array(0.2f)), (9L, Array(0.3f)))
      .toDF("vec_id", "embedding")
    val r = Curate.coverageAudit(docs, embs).head()
    assert(r.getAs[Long]("n_matched") == 2)
    assert(r.getAs[Long]("n_docs_without_vec") == 2) // 3 and 7
    assert(r.getAs[Long]("n_vecs_without_doc") == 1) // 9
    assert(r.getAs[Long]("orphan_doc_id_sum") == 10L)
    assert(r.getAs[Long]("orphan_vec_id_sum") == 9L)
    // both sides empty → all-zero row, not an empty frame
    val z = Curate.coverageAudit(
      docs.filter(col("doc_id") < 0), embs.filter(col("vec_id") < 0)).head()
    assert(z.getAs[Long]("n_matched") == 0)
    assert(z.getAs[Long]("orphan_doc_id_sum") == 0L)
  }
}
