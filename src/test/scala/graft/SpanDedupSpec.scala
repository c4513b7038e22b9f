package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.SpanDedup

/** Hand-computed cases for substring-span dedup (SpanDedup): the
  * "remove corpus-duplicated token windows" rule at windowLen=3 so
  * the arithmetic stays inspectable. */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], l: Int = 3, minDf: Int = 2) =
    SpanDedup.dedupCorpusSpans(rows.toDF("doc_id", "text"), l, minDf)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("a span shared by two docs is removed from both; unique text survives") {
    val got = run(Seq(
      (1L, "alpha beta gamma delta unique1 tail1"),
      (2L, "prefix2 alpha beta gamma delta end2")))
    // hot 3-windows: "alpha beta gamma", "beta gamma delta" (df=2) →
    // covered tokens: alpha..delta in both docs
    assert(got == Seq(
      (1L, 6L, 4L, "unique1 tail1"),
      (2L, 6L, 4L, "prefix2 end2")))
  }

  test("a window repeated only WITHIN one doc is not hot (distinct-doc df)") {
    val got = run(Seq(
      (1L, "x y z junk x y z"),
      (2L, "totally different words here now")))
    assert(got.head == ((1L, 7L, 0L, "x y z junk x y z")))
  }

  test("docs shorter than the window survive untouched (normalized)") {
    val got = run(Seq((1L, "one two"), (2L, "one two")))
    assert(got == Seq((1L, 2L, 0L, "one two"), (2L, 2L, 0L, "one two")))
  }

  test("tokenization is lowercased and whitespace-collapsed") {
    val got = run(Seq(
      (1L, "Alpha  Beta\tGamma extra1"),
      (2L, "alpha beta gamma extra2")))
    assert(got.map(_._3) == Seq(3L, 3L))
    assert(got.map(_._4) == Seq("extra1", "extra2"))
  }

  test("fully-duplicated doc empties; null/blank docs survive as one empty token") {
    val got = run(Seq(
      (1L, "same three words"),
      (2L, "same three words"),
      (3L, null.asInstanceOf[String])))
    assert(got.take(2) == Seq((1L, 3L, 3L, ""), (2L, 3L, 3L, "")))
    assert(got(2) == ((3L, 1L, 0L, "")))
  }

  test("deep clean: span removal exposes exact dups plain dedup misses") {
    // docs 1 and 2 differ ONLY in their boilerplate banner (which is
    // corpus-duplicated via docs 3/4) — after span removal both
    // collapse to "core payload text", so the exact stage drops one;
    // plain exact dedup on the RAW text would have kept both
    val rows = Seq(
      (1L, "banner one two three four five six seven core payload text", "a"),
      (2L, "other one two three four five six seven core payload text", "a"),
      (3L, "banner one two three four five six seven tail x", "b"),
      (4L, "other one two three four five six seven tail y", "b"))
      .toDF("doc_id", "text", "source")
    val got = SpanDedup.deepCleanStats(rows, windowLen = 8, minDf = 2)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // source a: both docs reduce to "core payload text" (8-windows
    // starting at 'one..' and beyond are shared) → one exact drop
    val a = got.head
    assert(a._1 == "a" && a._2 == 2L && a._4 == 1L && a._5 == 1L,
      s"expected one exact drop in source a: $a")
    // raw texts are pairwise distinct — plain exact dedup finds none
    assert(rows.select("text").distinct().count() == 4L)
  }

  private def runDecon(
      probe: Seq[(Long, String)], bench: Seq[(Long, String)], l: Int = 3) =
    SpanDedup.decontaminateSpans(
        probe.toDF("doc_id", "text"), bench.toDF("doc_id", "text"), l)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("decontaminateSpans excises only the bench-overlapping span") {
    val got = runDecon(
      probe = Seq(
        (1L, "intro the exact answer is here tail1"),
        (2L, "completely unrelated training words")),
      bench = Seq((100L, "question: the exact answer is here")))
    // bench 3-windows include "the exact answer", "exact answer is",
    // "answer is here" → probe doc 1 loses tokens 2..7; doc 2 clean
    assert(got == Seq(
      (1L, 7L, 5L, "intro tail1"),
      (2L, 4L, 0L, "completely unrelated training words")))
  }

  test("decontaminateSpans: probe window must match FULL-length; short bench docs contribute nothing") {
    val got = runDecon(
      probe = Seq((1L, "alpha beta gamma delta")),
      bench = Seq((100L, "alpha beta"))) // < windowLen → no windows
    assert(got == Seq((1L, 4L, 0L, "alpha beta gamma delta")))
  }

  test("decontaminateSpans: fully-leaked doc empties; blank/short probe docs survive normalized") {
    val got = runDecon(
      probe = Seq(
        (1L, "Same  Three\tWords"), // normalization + full cover
        (2L, "two toks"),           // shorter than window → untouched
        (3L, "")),                  // blank → one empty token
      bench = Seq((100L, "prefix same three words suffix")))
    assert(got == Seq(
      (1L, 3L, 3L, ""),
      (2L, 2L, 0L, "two toks"),
      (3L, 1L, 0L, "")))
  }

  test("decontaminateSpans: overlap WITHIN the probe corpus alone is not removed") {
    val got = runDecon(
      probe = Seq(
        (1L, "shared probe phrase one"),
        (2L, "shared probe phrase two")),
      bench = Seq((100L, "nothing in common here at all")))
    assert(got.map(_._3) == Seq(0L, 0L))
  }

  test("dedupDocSpans: repeat occurrences excised, first kept, greedy overlap") {
    val got = SpanDedup.dedupDocSpans(Seq(
        // "a b c" repeats at pos 5; covered {5,6,7} — the unique
        // trailing window "b c y" loses its b,c (greedy semantics)
        (1L, "x a b c a b c y"),
        // repetition only across docs, none within → untouched
        (2L, "p q r s"),
        (3L, "p q r t"),
        // shorter than the window → untouched (normalized)
        (4L, "one two")
      ).toDF("doc_id", "text"), windowLen = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got(0) == ((1L, 8L, 3L, "x a b c y")), got.toString)
    assert(got(1) == ((2L, 4L, 0L, "p q r s")))
    assert(got(2) == ((3L, 4L, 0L, "p q r t")))
    assert(got(3) == ((4L, 2L, 0L, "one two")))
  }

  test("dedupDocSpans: adjacent self-repetition collapses to one copy") {
    // "spam spam spam spam" with L=2: windows all identical at pos
    // 1..3; repeats at 2,3 cover {2,3,4} → kept = first token + the
    // first window's intact prefix
    val got = SpanDedup.dedupDocSpans(
        Seq((1L, "spam spam spam spam")).toDF("doc_id", "text"),
        windowLen = 2)
      .as[(Long, Long, Long, String)].head()
    assert(got == ((1L, 4L, 3L, "spam")), got.toString)
  }

  test("hotWindows audit counts distinct docs per window") {
    val hot = SpanDedup.hotWindows(Seq(
        (1L, "a b c d"),
        (2L, "a b c e"),
        (3L, "a b c f")).toDF("doc_id", "text"), windowLen = 3)
      .as[(Long, Long)].collect().toSeq
    assert(hot.map(_._2) == Seq(3L)) // one hot window "a b c", df=3
  }
}
