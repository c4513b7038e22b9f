package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.LineDedup

class LineDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    // "banner" appears in 3 docs, "footer" in 2, unique lines in 1
    (1L, "banner\nunique one\nfooter"),
    (2L, "banner\nunique two\nfooter"),
    (3L, "banner\nunique three"),
    (4L, "all mine\nnothing shared")).toDF("doc_id", "text")

  test("lineFrequencies counts distinct docs, not occurrences") {
    val rows = LineDedup.lineFrequencies(
      Seq((1L, "dup\ndup\nother"), (2L, "dup")).toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("dup", 2L, 3L), ("other", 1L, 1L)))
  }

  test("df>=2 lines removed everywhere; survivors keep original order") {
    val got = LineDedup.dedupCorpusLines(corpus, minDocFreq = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1L, 2L, "unique one"),
      (2L, 3L, 1L, 2L, "unique two"),
      (3L, 2L, 1L, 1L, "unique three"),
      (4L, 2L, 2L, 0L, "all mine\nnothing shared")))
  }

  test("threshold 3 keeps the df=2 footer but drops the df=3 banner") {
    val got = LineDedup.dedupCorpusLines(corpus, minDocFreq = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got.map(_._5) == Seq(
      "unique one\nfooter", "unique two\nfooter",
      "unique three", "all mine\nnothing shared"))
  }

  test("repeats inside ONE doc count once for df and both survive") {
    val got = LineDedup.dedupCorpusLines(
      Seq((1L, "twice\ntwice"), (2L, "other")).toDF("doc_id", "text"),
      minDocFreq = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 0L, "twice\ntwice"),
      (2L, 1L, 1L, 0L, "other")))
  }

  test("blank lines are trimmed away; fully-emptied and null docs survive") {
    val got = LineDedup.dedupCorpusLines(
      Seq((1L, "shared"), (2L, "shared\n  \n"), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"),
      minDocFreq = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 0L, 1L, ""),
      (2L, 1L, 0L, 1L, ""),
      (3L, 0L, 0L, 0L, "")))
  }

  test("minDocFreq below 2 is rejected (would delete every line)") {
    intercept[IllegalArgumentException] {
      LineDedup.dedupCorpusLines(corpus, minDocFreq = 1)
    }
  }
}
