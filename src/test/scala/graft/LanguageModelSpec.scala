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
}
