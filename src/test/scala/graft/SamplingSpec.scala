package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Sampling

/** Split/sample invariants that matter for training pipelines:
  * determinism under re-partitioning (no doc ever migrates between
  * train and test), full coverage, and plausible proportions. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, TestSpark.sf0001)

  test("split assignment is a pure function of the id (repartition-stable)") {
    val a = Sampling.assignSplit(docs)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.assignSplit(docs.repartition(17, col("text")))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("every row lands in exactly one split; proportions are plausible") {
    val counts = Sampling.splitCounts(docs)
      .as[(String, Long)].collect().toMap
    val total = docs.count()
    assert(counts.values.sum == total)
    // 80/10/10 with a small-N tolerance (hash variance at ~200 docs)
    assert(counts("train").toDouble / total > 0.6)
    assert(counts("val") > 0 && counts("test") > 0)
  }

  test("custom split weights honor their boundaries") {
    val counts = Sampling.splitCounts(docs,
        splits = Seq("a" -> 50, "b" -> 50))
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("a", "b"))
    assert(counts.values.sum == docs.count())
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, splits = Seq("a" -> 70, "b" -> 40))
    }
  }

  test("capPerSource truncates big sources, passes small ones whole, deterministically") {
    val full = docs.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    val cap = 5
    val c1 = Sampling.capPerSource(docs, cap)
    val c2 = Sampling.capPerSource(docs.repartition(13), cap)
    val got1 = c1.select("doc_id").as[Long].collect().sorted.toSeq
    assert(got1 == c2.select("doc_id").as[Long].collect().sorted.toSeq,
      "kept set must be repartition-stable")
    // subset of the corpus
    assert(c1.join(docs, Seq("doc_id"), "left_anti").count() == 0)
    val bydSrc = c1.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(bydSrc.keySet == full.keySet, "every source keeps ≥1 doc")
    bydSrc.foreach { case (src, n) =>
      assert(n == math.min(cap.toLong, full(src)),
        s"source $src kept $n of ${full(src)} at cap $cap")
    }
    // a cap above every source size is the identity
    assert(Sampling.capPerSource(docs, 1000000).count() == docs.count())
    intercept[IllegalArgumentException] {
      Sampling.capPerSource(docs, 0)
    }
  }

  test("stratified sample is a deterministic subset with ~right fractions") {
    val fr = Map("en" -> 0.5, "de" -> 1.0)
    val s1 = Sampling.stratifiedSample(docs, "lang", fr)
    val s2 = Sampling.stratifiedSample(docs, "lang", fr)
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq ==
      s2.select("doc_id").as[Long].collect().sorted.toSeq)
    val byLang = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.keySet == Set("en", "de"), "non-listed strata must drop")
    assert(byLang("de") == full("de"), "fraction 1.0 keeps the whole stratum")
    val enFrac = byLang("en").toDouble / full("en")
    assert(enFrac > 0.3 && enFrac < 0.7, s"en fraction $enFrac far from 0.5")
  }

  test("mixturePlan: tiny source saturates, lone unsaturated gets the rest") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "one two three four five", "tiny"),            // 5 tokens
      (2L, (1 to 5000).map(i => s"t$i").mkString(" "), "big")
    ).toDF("doc_id", "text", "source")
    val plan = Sampling.mixturePlan(docs, totalBudgetTokens = 1000L)
      .orderBy("source")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
      .map(r => r._1 -> r).toMap
    // tiny (5 of 5005 tokens) has the smaller avail/weight ratio: it
    // saturates at its 5 tokens; the lone unsaturated source gets the
    // exact remainder R·w div w = R = 995
    assert(plan("tiny") == (("tiny", 5L, plan("tiny")._3, 5L, true)), plan)
    assert(plan("big")._4 == 995L && !plan("big")._5, plan)
  }

  test("mixturePlan laws on the fixture corpus") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val total = docs.agg(sum(graft.llm.TextAnalysis
      .tokenCount(col("text")))).head().getLong(0)
    val b = total / 2
    val plan = Sampling.mixturePlan(docs, b)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    // never over-allocate: per source and in total
    assert(plan.forall(r => r._4 <= r._2), plan.toString)
    assert(plan.map(_._4).sum <= b)
    // saturated set is a prefix of the avail/weight-ratio order
    val sorted = plan.sortBy(r => (r._2 * 1000000L / r._3, r._1))
    val firstUnsat = sorted.indexWhere(!_._5)
    if (firstUnsat >= 0)
      assert(sorted.drop(firstUnsat).forall(!_._5),
        "saturation must be a ratio prefix")
    // budget >= total available: everything saturates at its avail
    val all = Sampling.mixturePlan(docs, total + 100)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(all.forall(r => r._5 && r._4 == r._2))
    // zero budget: zero allocation everywhere
    val zero = Sampling.mixturePlan(docs, 0L)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(zero.forall(r => r._4 == 0L && !r._5))
  }
}
