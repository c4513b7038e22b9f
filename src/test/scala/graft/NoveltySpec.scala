package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Novelty

class NoveltySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val reference =
    Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")

  test("hand-computed novelty: shared prefix, novel suffix (k=3)") {
    // cand shingles: "the quick brown", "quick brown cat" — first is in
    // the reference, second is not → novelty 1/2
    val cand = Seq((1L, "the quick brown cat")).toDF("doc_id", "text")
    val got = Novelty.noveltyVsReference(cand, reference, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L, 0.5)))
  }

  test("exact copy of a reference doc scores 0; disjoint doc scores 1") {
    val cand = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "completely different words here")).toDF("doc_id", "text")
    val got = Novelty.noveltyVsReference(cand, reference, k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(g => g._1 -> g._4) == Seq(1L -> 0.0, 2L -> 1.0))
  }

  test("shingling is case-insensitive (matches Dedup.shingles)") {
    val cand = Seq((1L, "THE QUICK BROWN fox jumps")).toDF("doc_id", "text")
    val got = Novelty.noveltyVsReference(cand, reference, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.head._4 == 0.0)
  }

  test("short doc (<k tokens) compares its whole text as one shingle") {
    val ref = Seq((100L, "hi there")).toDF("doc_id", "text")
    val cand = Seq((1L, "hi there"), (2L, "bye now")).toDF("doc_id", "text")
    val got = Novelty.noveltyVsReference(cand, ref, k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 0L, 0.0), (2L, 1L, 1L, 1.0)))
  }

  test("null/blank text scores novelty 1.0 with zero counts") {
    val cand = Seq((1L, null.asInstanceOf[String]), (2L, "  "))
      .toDF("doc_id", "text")
    val got = Novelty.noveltyVsReference(cand, reference, k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // blank text shingles to the empty-string singleton which the
    // reference does not contain → fully novel either way
    assert(got.forall(_._4 == 1.0))
  }

  test("bloom pre-prune is row-identical to the exact anti join") {
    // real corpus slice: every non-src0 doc vs the src0 reference
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val cand = docs.filter(col("source") =!= "src0")
    val ref = docs.filter(col("source") === "src0")
    val exact = Novelty.noveltyVsReference(cand, ref, k = 3)
      .orderBy("doc_id").collect().toSeq
    val bloomed = Novelty.noveltyVsReferenceBloom(cand, ref, k = 3)
      .orderBy("doc_id").collect().toSeq
    assert(bloomed == exact)
  }

  test("bloom variant survives heavy false positives (tiny sketch)") {
    // a sketch sized for 8 shingles at 50% fpp misroutes many truly
    // novel shingles into the exact join — the rows must not change
    val cand = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "completely different words here and more of them"),
      (3L, "the quick brown cat")).toDF("doc_id", "text")
    val exact = Novelty.noveltyVsReference(cand, reference, k = 3)
      .orderBy("doc_id").collect().toSeq
    val bloomed = Novelty.noveltyVsReferenceBloom(
        cand, reference, k = 3, expectedShingles = 8L, fpp = 0.5)
      .orderBy("doc_id").collect().toSeq
    assert(bloomed == exact)
  }

  test("bloom variant with an EMPTY reference marks everything novel") {
    // zero reference rows → the sketch aggregate's zero buffer (an
    // all-zeros bit array, NOT null) → every candidate shingle is a
    // provable miss; must equal the exact variant's all-novel answer
    val cand = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val emptyRef = reference.filter($"doc_id" < 0)
    val exact = Novelty.noveltyVsReference(cand, emptyRef, k = 3)
      .collect().toSeq
    val bloomed = Novelty.noveltyVsReferenceBloom(cand, emptyRef, k = 3)
      .collect().toSeq
    assert(bloomed == exact)
    assert(bloomed.head.getAs[Double]("novelty") == 1.0)
  }

  test("summary aggregates the per-doc rows") {
    val cand = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "completely different words here"),
      (3L, "the quick brown cat")).toDF("doc_id", "text")
    val got = Novelty.noveltySummary(cand, reference, k = 3)
      .as[(Long, Double, Long, Long)].collect().head
    assert(got._1 == 3L)
    assert(got._3 == 1L) // doc 2 fully novel
    assert(got._4 == 1L) // doc 1 fully seen
    assert(math.abs(got._2 - ((0.0 + 1.0 + 0.5) / 3 + 1e-9)) < 1e-3)
  }
}
