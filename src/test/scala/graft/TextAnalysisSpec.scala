package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token counting incl. irregular whitespace") {
    val got = Seq("a b  c", " x ", "one", "a\tb\nc d")
      .toDF("t").select(TextAnalysis.tokenCount($"t")).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(3, 1, 1, 4))
  }

  test("bpe-ish token count splits long words and punctuation") {
    val got = Seq("internationalization, yes!")
      .toDF("text").select(TextAnalysis.bpeishTokenCount($"text"))
      .head().getLong(0)
    // intern|atio|nali|zati|on + , + yes + ! = 8
    assert(got == 8)
  }

  test("language id picks the dominant stopword profile") {
    val got = Seq(
      "the cat sat on the mat and it is that good for you",
      "el gato la casa de que y en un los se por la vida",
      "le chat la maison de et les des un une du que bien",
      "der hund die katze und das von zu mit den ein ist hier")
      .toDF("text").select(TextAnalysis.langId($"text")).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("en", "es", "fr", "de"))
  }

  test("quality score bounded and ordered sensibly") {
    val scores = Seq(
      "the quick brown fox jumps over the lazy dog and it is a good day for all of us to be here",
      "@@@ ### !!! $$$ %%% ^^^ &&&")
      .toDF("text").select(TextAnalysis.qualityScore($"text")).collect()
      .map(_.getDouble(0)).toSeq
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores.head > scores.last)
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    val fps = Seq(
      "Hello   World", "hello world", "hello worlds")
      .toDF("t").select(TextAnalysis.fingerprint($"t")).collect()
      .map(_.getLong(0)).toSeq
    assert(fps(0) == fps(1)) // normalization collapses case+spaces
    assert(fps(1) != fps(2)) // content change changes the hash
    assert(fps.forall(f => f >= 0 && f < 2147483647L))
  }

  test("analyze projection over the fixture corpus") {
    val out = TextAnalysis.analyze(
      Tables.documents(spark, TestSpark.sf0001)).cache()
    assert(out.count() == 500)
    assert(out.filter($"n_tokens" <= 0).count() == 0)
    assert(out.filter($"quality" < 0 || $"quality" > 1).count() == 0)
    // fixture text is drawn from an English-ish vocab incl. 'the'
    assert(out.filter($"lang_pred" === "en").count() > 250)
  }
}
