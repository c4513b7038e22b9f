package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Drift

class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // A token counts: the=3, cat=2, sat=1 (tot 6)
  lazy val corpusA = Seq(
    (1L, "the cat sat"),
    (2L, "the the cat")).toDF("doc_id", "text")
  // B token counts: the=1, dog=2, ran=1 (tot 4)
  lazy val corpusB = Seq(
    (3L, "the dog ran"),
    (4L, "dog")).toDF("doc_id", "text")

  private def row(vocabSize: Int = 100) =
    Drift.driftSummary(corpusA, corpusB, vocabSize = vocabSize)
      .as[(Long, Long, Long, Double, Double, Double, String, Double)]
      .head()

  test("hand-computed divergences over the full pooled vocab") {
    // pooled vocab (5 tokens): the, cat, dog, sat, ran; k=5
    // p = (cnt_a + .5) / (6 + 2.5); q = (cnt_b + .5) / (4 + 2.5)
    val k = 5.0
    val pa = Map("the" -> 3.0, "cat" -> 2.0, "sat" -> 1.0)
      .withDefaultValue(0.0)
    val pb = Map("the" -> 1.0, "dog" -> 2.0, "ran" -> 1.0)
      .withDefaultValue(0.0)
    val toks = Seq("the", "cat", "dog", "sat", "ran")
    val p = toks.map(t => (pa(t) + 0.5) / (6.0 + 0.5 * k))
    val q = toks.map(t => (pb(t) + 0.5) / (4.0 + 0.5 * k))
    val klAB = p.zip(q).map { case (x, y) => x * math.log(x / y) }.sum
    val klBA = p.zip(q).map { case (x, y) => y * math.log(y / x) }.sum
    val js = p.zip(q).map { case (x, y) =>
      val m = (x + y) / 2
      0.5 * x * math.log(x / m) + 0.5 * y * math.log(y / m)
    }.sum
    val (nv, ta, tb, gKlAB, gKlBA, gJs, topTok, topAbs) = row()
    assert(nv == 5L && ta == 6L && tb == 4L)
    assert(math.abs(gKlAB - klAB) < 1e-9)
    assert(math.abs(gKlBA - klBA) < 1e-9)
    assert(math.abs(gJs - js) < 1e-9)
    // |p−q| is maximized by 'the' (.4118−.2308=.1810 vs dog .3846−.0588=.3258)
    val diffs = toks.zip(p.zip(q)).map { case (t, (x, y)) =>
      (t, math.abs(x - y))
    }
    val (expTok, expAbs) = diffs.maxBy(_._2)
    assert(topTok == expTok)
    assert(math.abs(topAbs - expAbs) < 1e-9)
  }

  test("JS is symmetric and bounded by ln 2; KL directions differ") {
    val (_, _, _, klAB, klBA, js, _, _) = row()
    val swapped = Drift.driftSummary(corpusB, corpusA, vocabSize = 100)
      .as[(Long, Long, Long, Double, Double, Double, String, Double)]
      .head()
    assert(math.abs(swapped._6 - js) < 1e-12, "JS must be symmetric")
    assert(math.abs(swapped._4 - klBA) < 1e-12)
    assert(js > 0 && js < math.log(2.0))
    assert(klAB != klBA)
  }

  test("identical corpora have zero divergence and zero top drift") {
    val (_, _, _, klAB, klBA, js, _, topAbs) =
      Drift.driftSummary(corpusA, corpusA, vocabSize = 100)
        .as[(Long, Long, Long, Double, Double, Double, String, Double)]
        .head()
    assert(math.abs(klAB) < 1e-12 && math.abs(klBA) < 1e-12)
    assert(math.abs(js) < 1e-12 && math.abs(topAbs) < 1e-12)
  }

  test("vocab cut keeps the top tokens of the POOLED distribution") {
    // vocabSize=2 keeps the two tokens with highest cnt_a+cnt_b:
    // the(4), dog(2) — cat(2) loses the tie to dog? No: tie broken by
    // token ASC, so cat beats dog at pooled count 2 → vocab={the,cat}.
    val (nv, ta, tb, _, _, _, _, _) = row(vocabSize = 2)
    assert(nv == 2L)
    assert(ta == 5L, "in-vocab A tokens: the=3 + cat=2")
    assert(tb == 1L, "in-vocab B tokens: the=1 + cat=0")
  }

  // ---- driftBySource ----

  lazy val sourced = Seq(
    (1L, "the cat sat", "s1"),
    (2L, "the the cat", "s1"),
    (3L, "the dog ran", "s2"),
    (4L, "dog", "s2")).toDF("doc_id", "text", "source")

  test("per-source JS on a 2-source corpus equals the pairwise summary") {
    // With exactly two sources, "source vs rest" IS "A vs B": the
    // global vocab equals the pooled vocab, tot_s/rest equal
    // tot_a/tot_b — so both sources must report the driftSummary JS,
    // and (JS being symmetric) the same value as each other.
    val expected = Drift
      .driftSummary(corpusA, corpusB, vocabSize = 100)
      .as[(Long, Long, Long, Double, Double, Double, String, Double)]
      .head()._6
    val got = Drift.driftBySource(sourced, vocabSize = 100)
      .orderBy("source")
      .as[(String, Long, Double, String, Double)].collect()
    assert(got.map(_._1).toSeq == Seq("s1", "s2"))
    assert(got(0)._2 == 6L && got(1)._2 == 4L)
    assert(math.abs(got(0)._3 - expected) < 1e-12)
    assert(math.abs(got(1)._3 - expected) < 1e-12)
    assert(math.abs(got(0)._3 - got(1)._3) < 1e-12)
  }

  test("identically-distributed equal-size sources have zero drift") {
    val uniform = Seq(
      (1L, "a b", "s1"), (2L, "a b", "s2")).toDF("doc_id", "text", "source")
    val got = Drift.driftBySource(uniform, vocabSize = 100)
      .as[(String, Long, Double, String, Double)].collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(math.abs(r._3) < 1e-12, s"source ${r._1}: js ${r._3}")
      assert(math.abs(r._5) < 1e-12)
    }
  }

  test("single-source corpus smooths the rest side instead of crashing") {
    val solo = Seq((1L, "a a b", "s1")).toDF("doc_id", "text", "source")
    val got = Drift.driftBySource(solo, vocabSize = 100)
      .as[(String, Long, Double, String, Double)].collect()
    assert(got.length == 1)
    val (_, tokSrc, js, _, _) = got.head
    assert(tokSrc == 3L)
    // rest-of-corpus is empty → q smooths to uniform 1/k; drift of
    // (a=2,b=1) against uniform is finite and positive
    assert(js > 0 && js < math.log(2.0))
  }

  test("numeric PSI: hand-computed bins, identical sides give near-zero") {
    import org.apache.spark.sql.functions._
    // reference 0..9 → lo=0, hi=9, width 0.9; bins: floor(v/0.9) capped
    val ref = (0 until 10).map(v => v.toDouble).toDF("value")
    // current shifted up: half the mass lands in the top bin
    val cur = Seq(8.0, 8.5, 9.0, 9.0, 20.0, -5.0).toDF("value")
    val rows = Drift.psiNumeric(ref, cur, "value").collect()
    val byBin = rows.map(r => r.getAs[Int]("bin") ->
      ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur")))).toMap
    // v=20 clamps to bin 9, v=-5 clamps to bin 0; each ref value lands
    // in its own bin (floor(v/0.9), v=9 clamped down into bin 9)
    assert(byBin(0) == ((1L, 1L)))
    assert(byBin(8) == ((1L, 1L))) // ref 8, cur 8.0
    assert(byBin(9) == ((1L, 4L))) // ref 9; cur 8.5, 9, 9, 20
    assert(rows.map(_.getAs[Double]("psi_term")).sum > 0.1,
      "a shifted distribution must show positive PSI")
    // identical sides: every term ~0 (smoothing keeps it finite)
    val same = Drift.psiNumeric(ref, ref, "value").collect()
    assert(same.forall(r => math.abs(r.getAs[Double]("psi_term")) < 1e-9))
    // empty reference degrades to bin 0, not a crash
    val z = Drift.psiNumeric(ref.filter(lit(false)), cur, "value").collect()
    assert(z.nonEmpty)
  }

  test("two empty corpora degrade to a zero row, not a crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = Drift.driftSummary(empty, empty).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 0L && r.getDouble(5) == 0.0)
    assert(r.isNullAt(6), "top_drift_token must be null on empty input")
  }

  test("corpusDiff: every category lands where planted, id-sums pin membership") {
    val prev = Seq(
      (1L, "kept unchanged text"),
      (2L, "soon to be rewritten"),
      (3L, "soon to be removed"),
      (4L, "also unchanged here")).toDF("doc_id", "text")
    val cur = Seq(
      (1L, "kept unchanged text"),
      (2L, "rewritten content now"),
      (4L, "also unchanged here"),
      (9L, "brand new document")).toDF("doc_id", "text")
    val r = Drift.corpusDiff(prev, cur).head()
    assert(r.getAs[Long]("n_prev") == 4)
    assert(r.getAs[Long]("n_cur") == 4)
    assert(r.getAs[Long]("n_added") == 1)
    assert(r.getAs[Long]("n_removed") == 1)
    assert(r.getAs[Long]("n_changed") == 1)
    assert(r.getAs[Long]("n_unchanged") == 2)
    assert(r.getAs[Long]("added_id_sum") == 9L)
    assert(r.getAs[Long]("removed_id_sum") == 3L)

    // identical snapshots: all unchanged, zero churn
    val same = Drift.corpusDiff(prev, prev).head()
    assert(same.getAs[Long]("n_added") == 0)
    assert(same.getAs[Long]("n_removed") == 0)
    assert(same.getAs[Long]("n_changed") == 0)
    assert(same.getAs[Long]("n_unchanged") == 4)

    // empty current snapshot: everything removed, sums don't NPE
    val gone = Drift.corpusDiff(prev, cur.filter("doc_id < 0")).head()
    assert(gone.getAs[Long]("n_removed") == 4)
    assert(gone.getAs[Long]("removed_id_sum") == 10L)
    assert(gone.getAs[Long]("added_id_sum") == 0L)
  }

  test("distinctiveTerms: a planted over-indexing token ranks first, hand-checked z") {
    // source A: 'zebra' appears 10 times, only in A; shared filler
    // 'the' dominates both sources (so the prior mass concentrates
    // there and the z-ordering is doing real work).
    val docs = Seq(
      (1L, "A", "zebra zebra zebra zebra zebra the the the"),
      (2L, "A", "zebra zebra zebra zebra zebra the the the"),
      (3L, "B", "the the the the the the the the"),
      (4L, "B", "the the the the the the the the")).toDF(
      "doc_id", "source", "text")
    val r = Drift.distinctiveTerms(docs, topN = 2, alpha0 = 10.0)
      .collect()
    val aTop = r.filter(_.getString(0) == "A").sortBy(_.getLong(1))
    assert(aTop.head.getString(2) == "zebra")
    assert(aTop.head.getLong(3) == 10L)
    // hand-compute the planted token's z: y_sw=10, n_s=16, y_w=10,
    // n=32, a0=10 → aw=10*10/32=3.125
    val aw = 10.0 * 10.0 / 32.0
    val delta = math.log((10 + aw) / (16 + 10.0 - 10 - aw)) -
      math.log((0 + aw) / (32.0 - 16 + 10.0 - 0 - aw))
    val z = delta / math.sqrt(1.0 / (10 + aw) + 1.0 / (0 + aw))
    assert(math.abs(aTop.head.getDouble(4) - z) < 1e-4)
    // the token absent from B must UNDER-index there (negative z)
    val bZebra = Drift.distinctiveTerms(docs, topN = 500, alpha0 = 10.0)
      .filter("source = 'B' AND token = 'zebra'").collect()
    assert(bZebra.length == 1 && bZebra.head.getDouble(4) < 0)
  }

  test("distinctiveTerms: rank is dense 1..topN per source, capped by topN") {
    val docs = Seq(
      (1L, "A", "alpha beta gamma delta"),
      (2L, "B", "beta gamma delta epsilon")).toDF(
      "doc_id", "source", "text")
    val r = Drift.distinctiveTerms(docs, topN = 3).collect()
    val bySrc = r.groupBy(_.getString(0))
    assert(bySrc.keySet == Set("A", "B"))
    bySrc.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
    }
  }

  test("distinctiveTerms: single-source corpus degrades to finite z, not div0") {
    val docs = Seq(
      (1L, "only", "some words repeated words"),
      (2L, "only", "more words here")).toDF("doc_id", "source", "text")
    val r = Drift.distinctiveTerms(docs, topN = 5).collect()
    assert(r.nonEmpty)
    assert(r.forall(row => !row.getDouble(4).isNaN &&
      !row.getDouble(4).isInfinite))
  }

  test("embeddingDrift: identical snapshots score ~0, topic shift moves mass") {
    import org.apache.spark.sql.DataFrame
    // two orthogonal "topics": e0-aligned (centroid 0) and e1-aligned
    // (centroid 1); centroids come from the reference's lowest ids
    def vecs(rows: Seq[(Long, Int)]): DataFrame =
      rows.map { case (id, axis) =>
        (id, Array.tabulate(8)(i => if (i == axis) 1.0f else 0.0f))
      }.toDF("vec_id", "embedding")
    val ref = vecs(Seq((0L, 0), (1L, 1), (2L, 0), (3L, 1), (4L, 0), (5L, 1)))
    // identical snapshot → every psi term 0 after rounding
    val same = Drift.embeddingDrift(ref, ref, k = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(same.map(_._1) == Seq(0L, 1L))
    assert(same.forall(r => r._2 == r._3 && r._4 == 0.0), same.toString)
    // shifted snapshot: everything lands on topic e1 → cluster 0
    // starves, cluster 1 swells, both PSI terms strictly positive
    val cur = vecs(Seq((10L, 1), (11L, 1), (12L, 1), (13L, 1)))
    val moved = Drift.embeddingDrift(ref, cur, k = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val byC = moved.map(r => r._1 -> r).toMap
    assert(byC(0L)._2 == 3L && byC(0L)._3 == 0L, moved.toString)
    assert(byC(1L)._2 == 3L && byC(1L)._3 == 4L, moved.toString)
    assert(moved.forall(_._4 > 0.0),
      s"both directions of mass movement have positive PSI terms: $moved")
    // empty current snapshot still yields the dense k-row grid
    val empty = Drift.embeddingDrift(ref, cur.filter($"vec_id" < 0), k = 2)
    assert(empty.count() == 2L)
  }
}
