package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Importance

class ImportanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // target corpus: astronomy-flavored; raw corpus mixes on-target,
  // off-target, and neutral documents
  lazy val target = Seq(
    (100L, "stars galaxies nebulae orbit telescope stars galaxies"),
    (101L, "telescope orbit planets stars comet galaxies nebulae")
  ).toDF("doc_id", "text")

  lazy val raw = Seq(
    (1L, "stars galaxies telescope orbit nebulae comet"), // on-target
    (2L, "recipe flour sugar butter oven bake frosting"),  // off-target
    (3L, "stars recipe galaxies flour telescope sugar")    // mixed
  ).toDF("doc_id", "text")

  test("importance weights rank on-target docs above off-target docs") {
    val w = Importance.importanceWeights(raw, target, numBuckets = 4096)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(w.map(_._1) == Seq(1L, 2L, 3L))
    val byId = w.map(r => r._1 -> r._3).toMap
    assert(byId(1L) > byId(3L) && byId(3L) > byId(2L),
      s"on-target > mixed > off-target: $w")
    // token counts come through the same tokenizer as the engine
    assert(w.map(_._2) == Seq(6L, 7L, 6L))
  }

  test("importanceSelect keeps the n most target-like docs") {
    val kept = Importance.importanceSelect(raw, target, n = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"top-1 is the on-target doc: $kept")
    val kept2 = Importance.importanceSelect(raw, target, n = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(1L, 3L), s"top-2 adds the mixed doc: $kept2")
    // n >= corpus keeps everything
    assert(Importance.importanceSelect(raw, target, n = 10).count() == 3L)
  }

  test("frozenScorer matches the distributed scorer and filters at the threshold") {
    val scoreAll = graft.llm.Importance.frozenScorer(
      raw, target, minAvgLogRatio = -1e9)(raw)
    val rowLocal = scoreAll.select("doc_id", "avg_log_ratio")
      .as[(Long, Double)].collect().toMap
    val dist = Importance.importanceWeights(raw, target)
      .select("doc_id", "avg_log_ratio").as[(Long, Double)].collect().toMap
    assert(rowLocal.keySet == dist.keySet)
    rowLocal.foreach { case (id, w) =>
      assert(math.abs(w - dist(id)) < 1e-3,
        s"doc $id: row-local $w vs distributed ${dist(id)}")
    }
    // threshold keeps exactly the docs at/above it
    val thr = rowLocal(3L) // the mixed doc's score
    val kept = graft.llm.Importance.frozenScorer(raw, target, thr)(raw)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"on-target + mixed clear the bar: $kept")
  }

  test("importanceFilter keeps docs at or above the threshold") {
    val model = Importance.importanceModel(raw, target)
    val all = Importance.importanceFilter(raw, model, -1e9)
    assert(all.count() == 3L)
    val none = Importance.importanceFilter(raw, model, 1e9)
    assert(none.count() == 0L)
  }

  test("degenerate edges: empty target and identical corpora") {
    // empty target: every bucket numerator is the +1 smoothing floor —
    // scores are finite and the op does not crash
    val w = Importance.importanceWeights(
      raw, target.filter($"doc_id" < 0), numBuckets = 4096)
    assert(w.count() == 3L)
    assert(w.select("avg_log_ratio").as[Double].collect()
      .forall(d => !d.isNaN && !d.isInfinite))
    // raw == target: the mean log-ratio is a per-doc constant shift
    // (ln(n_r+B) - ln(n_t+B) = 0 when the corpora are identical), so
    // every doc scores ~0 modulo smoothing — and identically-
    // distributed docs tie
    val same = Importance.importanceWeights(target, target, 4096)
      .select("avg_log_ratio").as[Double].collect().toSeq
    assert(same.forall(d => math.abs(d) < 1e-9), s"self-ratio is 0: $same")
  }
}
