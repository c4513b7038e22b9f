package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.LanguageModel

class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus token counts: the=4, cat=2, sat=2, mat=1, dog=1 → total 10
  lazy val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the cat sat the mat"),
    (3L, "the dog")).toDF("doc_id", "text")

  test("hand-computed scores with full vocab") {
    val got = LanguageModel.scoreUnigram(docs, vocabSize = 100)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
    def lp(c: Double) = math.log(c / 10.0)
    val exp = Seq(
      (1L, 3L, (lp(4) + lp(2) + lp(2)) / 3),
      (2L, 5L, (lp(4) + lp(2) + lp(2) + lp(4) + lp(1)) / 5),
      (3L, 2L, (lp(4) + lp(1)) / 2))
    got.zip(exp).foreach { case ((id, n, s), (eid, en, es)) =>
      assert(id == eid && n == en)
      assert(math.abs(s - es) < 1e-9, s"doc $id: $s vs $es")
    }
  }

  test("tokens outside the vocab cut score at the OOV floor") {
    // vocabSize=1 keeps only 'the' (count 4); everything else floors
    val got = LanguageModel.scoreUnigram(docs, vocabSize = 1)
      .filter(col("doc_id") === 3L)
      .as[(Long, Long, Double)].head()
    val exp = (math.log(4 / 10.0) + math.log(0.5 / 10.0)) / 2
    assert(math.abs(got._3 - exp) < 1e-9)
  }

  test("vocab cut is deterministic across tied counts") {
    // cat and sat tie at 2; (cnt DESC, token ASC) keeps 'cat' first
    val v = LanguageModel.vocab(docs, vocabSize = 2)
      .as[(String, Long)].collect().toSeq
    assert(v == Seq(("the", 4L), ("cat", 2L)))
  }

  test("scoring is case-insensitive and null-safe") {
    val messy = Seq((1L, "The THE the"), (2L, null: String))
      .toDF("doc_id", "text")
    val got = LanguageModel.scoreUnigram(messy, vocabSize = 10)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    // tokens: the×3 + '' (null → one empty token); total 4
    assert(got(0)._2 == 3L)
    assert(math.abs(got(0)._3 - math.log(3 / 4.0)) < 1e-9)
    assert(got(1)._2 == 1L)
  }

  test("higher-quality (in-distribution) docs outscore OOV-heavy docs") {
    val big = (0 until 50).map(i => (i.toLong, "common words repeated here")) ++
      Seq((99L, "zxqv wvut qpon mlkj"))
    val scores = LanguageModel.scoreUnigram(big.toDF("doc_id", "text"),
        vocabSize = 4)
      .select("doc_id", "avg_logprob").as[(Long, Double)].collect().toMap
    assert(scores(0L) > scores(99L))
  }

  // ── bigram model ────────────────────────────────────────────────

  // unigrams: a=4 b=3 c=1, total 8; bigrams: (a,b)=3 (b,a)=1 (c,a)=1
  lazy val bgDocs = Seq(
    (1L, "a b a b"),
    (2L, "a b"),
    (3L, "c a")).toDF("doc_id", "text")

  test("hand-computed interpolated bigram scores") {
    // vocab=2 keeps a,b; bigramVocab=2 keeps (a,b) then the tie at
    // bcnt=1 breaks (bcnt DESC, w1, w2): (b,a) in, (c,a) out
    val got = LanguageModel.scoreBigram(bgDocs, vocabSize = 2,
        bigramVocabSize = 2, lambda = 0.5)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    val ab = math.log(0.5 * (3.0 / 4.0) + 0.5 * (3.0 / 8.0)) // -0.5754
    val ba = math.log(0.5 * (1.0 / 3.0) + 0.5 * (4.0 / 8.0)) // -0.8755
    val ca = math.log(0.5 * 0.0 + 0.5 * (4.0 / 8.0))          // backoff
    val exp = Seq(
      (1L, 3L, (2 * ab + ba) / 3),
      (2L, 1L, ab),
      (3L, 1L, ca))
    got.zip(exp).foreach { case ((id, n, s), (eid, en, es)) =>
      assert(id == eid && n == en, s"doc $id: n=$n")
      assert(math.abs(s - es) < 1e-9, s"doc $id: $s vs $es")
    }
  }

  test("documents with fewer than two tokens emit no bigram rows") {
    val short = bgDocs.union(
      Seq((9L, "solo"), (10L, null: String)).toDF("doc_id", "text"))
    val ids = LanguageModel.scoreBigram(short, vocabSize = 10,
        bigramVocabSize = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L))
  }

  test("OOV bigrams back off to the unigram term, never -Infinity") {
    val got = LanguageModel.scoreBigram(bgDocs, vocabSize = 1,
        bigramVocabSize = 1, lambda = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(got.forall(r => !r._3.isNegInfinity && !r._3.isNaN))
  }

  test("BPE merge pairs: frequency-weighted char-pair counts") {
    // words: aa ×2, ab ×1, bab ×1, c ×1 (dropped: single char)
    // pairs: aa←2(from aa); ab←1(ab)+1(bab); ba←1(bab)
    val docs = Seq((1L, "aa ab c"), (2L, "aa bab")).toDF("doc_id", "text")
    val got = LanguageModel.bpeMergePairs(docs, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("aa", 2L), ("ab", 2L), ("ba", 1L)), got.toString)
  }

  test("OOV rate by source: vocab cut separates the outlier source") {
    // vocab of size 2 keeps the two dominant tokens; source 'z' is
    // fully out-of-vocabulary
    val docs = Seq(
      (1L, "aa aa bb", "clean"),
      (2L, "aa bb", "clean"),
      (3L, "qq rr", "z")
    ).toDF("doc_id", "text", "source")
    val got = LanguageModel.oovRateBySource(docs, vocabSize = 2)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("clean", 5L, 0L, 0.0), ("z", 2L, 2L, 1.0)))
  }

  test("BPE encode: top merges applied as a replace chain, counts agree") {
    // same corpus as the merge-pairs case: merges (cnt DESC, l, r) =
    // (a,a)←2, (a,b)←2, (b,a)←1 → applied in that order
    val docs = Seq((1L, "aa ab c"), (2L, "aa bab")).toDF("doc_id", "text")
    val merges = LanguageModel.bpeTopMerges(docs, nMerges = 3)
      .as[(String, String, Long)].collect().toSeq
    assert(merges == Seq(("a", "a", 2L), ("a", "b", 2L), ("b", "a", 1L)))
    val got = LanguageModel.bpeEncodeCounts(docs)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1: aa→[aa](1), ab→[ab](1), c→[c](1): words 3, before 5, after 3
    // doc 2: aa→[aa](1); bab: " b a b "—(a,a) no hit, (a,b) merges
    //   " a b "→" ab " leaving " b ab ", (b,a) no " b a " left → 2 subwords
    assert(got == Seq((1L, 3L, 5L, 3L), (2L, 2L, 5L, 3L)))
  }

  test("fluent (high-bigram-probability) docs outscore shuffled ones") {
    val fluent = (0 until 30).map(i => (i.toLong, "the cat sat on the mat"))
    val shuffled = Seq((99L, "mat the on sat cat the"))
    val scores = LanguageModel.scoreBigram(
        (fluent ++ shuffled).toDF("doc_id", "text"),
        vocabSize = 10, bigramVocabSize = 5)
      .select("doc_id", "avg_logprob").as[(Long, Double)].collect().toMap
    assert(scores(0L) > scores(99L))
  }

  test("pplBuckets: tercile split is monotone in score, roughly even") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val got = LanguageModel.pplBuckets(docs)
      .as[(Long, Long, String)].collect().toSeq
    assert(got.nonEmpty)
    val byBucket = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // monotone: every head score >= every middle score >= every tail
    assert(byBucket("head").min >= byBucket("middle").max)
    assert(byBucket("middle").min >= byBucket("tail").max)
    // terciles: no bucket is off by more than the tie mass at the
    // boundary (scores are near-unique in the fixture; allow slack)
    val n = got.size
    byBucket.values.foreach(b =>
      assert(math.abs(b.size - n / 3) <= n / 6, byBucket.view.mapValues(_.size).toMap))
  }

  test("pplKeep drops exactly the tail bucket") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val buckets = LanguageModel.pplBuckets(docs)
      .as[(Long, Long, String)].collect().toSeq
    val wantKept = buckets.filter(b => b._3 != "tail").map(_._1).toSet
    val kept = LanguageModel.pplKeep(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == wantKept)
  }

  test("pplKeep passes unscoreable (<2-token) docs through") {
    // the round-14 contract: the act step drops docs affirmatively
    // labeled tail — a doc the LM produced no evidence about (no
    // bigrams) is KEPT, not silently lost
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text")
      .unionByName(Seq(
        (7000001L, "solo"),
        (7000002L, "")).toDF("doc_id", "text"))
    val kept = LanguageModel.pplKeep(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(7000001L) && kept.contains(7000002L),
      "unscoreable docs pass through")
    // and they are genuinely unscored, not scored-and-kept
    val scored = LanguageModel.pplBuckets(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(!scored.contains(7000001L) && !scored.contains(7000002L))
  }
}
