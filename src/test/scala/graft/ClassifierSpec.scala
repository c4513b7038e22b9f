package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Classifier

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // labeled train corpus: "good" docs talk about science, "bad" docs
  // are keyword spam
  lazy val train = Seq(
    (1L, "the experiment measured the reaction carefully", true),
    (2L, "results show the hypothesis held under repeated trials", true),
    (3L, "buy cheap pills now discount discount casino", false),
    (4L, "casino bonus click now cheap winner winner", false)
  ).toDF("doc_id", "text", "good")

  test("nb classifier separates on-class from off-class docs") {
    val score = Seq(
      (10L, "the trials measured the reaction and the hypothesis"),
      (11L, "cheap casino bonus discount click now"),
      (12L, "entirely novel words unseen anywhere")
    ).toDF("doc_id", "text")
    val got = Classifier.nbClassify(train, $"good", score, vocabSize = 100)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(10L)._5, s"science doc predicted positive: $got")
    assert(!byId(11L)._5, s"spam doc predicted negative: $got")
    // the all-OOV doc falls back to the prior alone (llr sum 0,
    // n_vocab_hits 0); balanced classes → prior ln(5/5) = 0 → not > 0
    assert(byId(12L)._3 == 0L && !byId(12L)._5,
      s"OOV doc scores the bare prior: $got")
    assert(byId(10L)._4 > byId(12L)._4 && byId(12L)._4 > byId(11L)._4,
      s"score ordering: $got")
  }

  test("nb model is bounded and the prior reflects class balance") {
    val (llr, prior) = Classifier.nbTrain(train, $"good", vocabSize = 5)
    assert(llr.count() <= 5L, "vocab cut bounds the model")
    val p = prior.head().getDouble(0)
    assert(math.abs(p - math.log(3.0 / 3.0)) < 1e-12,
      s"2 pos + 2 neg docs → smoothed prior ln(3/3)=0 … got $p")
    // skewed classes move the prior
    val (_, prior2) = Classifier.nbTrain(
      train.filter($"doc_id" =!= 4L), $"good", vocabSize = 5)
    assert(prior2.head().getDouble(0) > 0.0, "2 pos vs 1 neg → prior > 0")
  }

  test("nbFilter keeps exactly the predicted-positive docs") {
    val docs = Seq(
      (20L, "the hypothesis held in the experiment"),
      (21L, "casino discount pills cheap")
    ).toDF("doc_id", "text")
    val kept = Classifier.nbFilter(train, $"good", docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(20L), s"filter keeps the on-class doc: $kept")
  }
}
