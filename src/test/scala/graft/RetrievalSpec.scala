package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Retrieval

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // N=3, avgdl = 8/3; df(a)=2, df(b)=2 -> idf = ln(1.6) for both
  lazy val docs = Seq(
    (1L, "a b a"),
    (2L, "a c"),
    (3L, "b b b")).toDF("doc_id", "text")

  test("hand-computed BM25 scores and ranking") {
    val got = Retrieval.bm25TopK(docs, Seq("a", "b"))
      .as[(Long, Long, Double)].collect().toSeq
    // doc1: idf*(2*2.2/(2+1.3125)) + idf*(1*2.2/(1+1.3125)) = 1.0714
    // doc3: idf*(3*2.2/(3+1.3125))                           = 0.7193
    // doc2: idf*(1*2.2/(1+0.975))                            = 0.5235
    assert(got == Seq(
      (1L, 2L, 1.0714),
      (3L, 1L, 0.7193),
      (2L, 1L, 0.5235)))
  }

  test("k truncates after the (score desc, id) sort") {
    val got = Retrieval.bm25TopK(docs, Seq("a", "b"), k = 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("terms absent from the corpus yield no rows, not errors") {
    assert(Retrieval.bm25TopK(docs, Seq("zzz")).isEmpty)
  }

  test("matching is case-insensitive and null-text-safe") {
    val messy = Seq(
      (1L, "A b a"), (2L, null: String)).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(messy, Seq("a"))
      .select("doc_id", "n_terms_hit").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L)))
  }

  test("a term hitting every document still scores (idf = ln(1+1/(N+0.5)) > 0)") {
    val all = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(all, Seq("x"))
    assert(got.count() == 3)
    assert(got.agg(min(col("bm25"))).head().getDouble(0) > 0.0)
  }

  test("top-k plan is TakeOrderedAndProject, not a global sort") {
    val plan = Retrieval.bm25TopK(docs, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("persisted BM25 index: indexed probe ≡ live scoring") {
    val corpus = Tables.documents(spark, TestSpark.sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("bm25_index").toString
    assert(!Retrieval.bm25IndexExists(spark, path))
    Retrieval.writeBm25Index(corpus, path)
    assert(Retrieval.bm25IndexExists(spark, path))
    val terms = Seq("hash", "merge", "scan")
    val live = Retrieval.bm25TopK(corpus, terms, k = 15)
      .as[(Long, Long, Double)].collect().toSeq
    val indexed = Retrieval.bm25TopKIndexed(spark, path, terms, k = 15)
      .as[(Long, Long, Double)].collect().toSeq
    assert(indexed == live, s"indexed=$indexed\nlive=$live")
    // non-default params reuse the same index (k1/b are query-time)
    val live2 = Retrieval.bm25TopK(corpus, terms, k = 15,
      k1 = 0.9, b = 0.4).as[(Long, Long, Double)].collect().toSeq
    val indexed2 = Retrieval.bm25TopKIndexed(spark, path, terms,
      k = 15, k1 = 0.9, b = 0.4)
      .as[(Long, Long, Double)].collect().toSeq
    assert(indexed2 == live2)
    // probe I/O contract: the query terms' token IN filter reaches
    // the postings scan as a pushed data filter
    val plan = Retrieval.bm25TopKIndexed(spark, path, terms, k = 15)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(token"), plan)
  }

  test("BM25 append ≡ full rebuild, probe-for-probe (associativity)") {
    val corpus = Tables.documents(spark, TestSpark.sf0001)
    val base = corpus.filter($"doc_id" % 2 === 0)
    val late = corpus.filter($"doc_id" % 2 === 1)
    val appended = java.nio.file.Files
      .createTempDirectory("bm25_appended").toString
    Retrieval.writeBm25Index(base, appended)
    Retrieval.appendToBm25Index(late, appended, segId = "late1")
    val rebuilt = java.nio.file.Files
      .createTempDirectory("bm25_rebuilt").toString
    Retrieval.writeBm25Index(corpus, rebuilt)
    val terms = Seq("hash", "merge", "scan")
    def probe(p: String) =
      Retrieval.bm25TopKIndexed(spark, p, terms, k = 15)
        .as[(Long, Long, Double)].collect().toSeq
    val r = probe(rebuilt)
    assert(probe(appended) == r, s"appended=${probe(appended)}\nrebuilt=$r")
    // the summed aggregates themselves are exact, not just the top-k
    def stats(p: String) = spark.read.parquet(s"$p/stats")
      .agg(sum($"n_docs"), sum($"total_dl")).as[(Long, Long)].head()
    assert(stats(appended) == stats(rebuilt),
      s"stats appended=${stats(appended)} rebuilt=${stats(rebuilt)}")
    def dfAgg(p: String) = spark.read.parquet(s"$p/df")
      .groupBy("token").agg(sum($"df").as("df"))
    val dfDiff = dfAgg(appended).exceptAll(dfAgg(rebuilt)).count()
    assert(dfDiff == 0, s"df tables differ in $dfDiff rows")

    // REPLAY idempotency: re-running the same append with the same
    // segment id converges instead of double-counting tf/df/stats
    val postingsBefore = spark.read.parquet(s"$appended/postings").count()
    Retrieval.appendToBm25Index(late, appended, segId = "late1")
    assert(spark.read.parquet(s"$appended/postings").count()
      == postingsBefore, "replayed append duplicated postings")
    assert(stats(appended) == stats(rebuilt), "replayed append double-counted")
    assert(probe(appended) == r)

    // compaction restores the canonical single-segment layout: every
    // table equals the rebuild's row for row, and probes are unchanged
    Retrieval.compactBm25Index(spark, appended)
    for (t <- Seq("postings", "df", "stats")) {
      val d = spark.read.parquet(s"$appended/$t")
        .exceptAll(spark.read.parquet(s"$rebuilt/$t")).count()
      val d2 = spark.read.parquet(s"$rebuilt/$t")
        .exceptAll(spark.read.parquet(s"$appended/$t")).count()
      assert(d == 0 && d2 == 0, s"$t differs after compaction: +$d -$d2")
    }
    assert(probe(appended) == r)
    // row-group pruning survives compaction (token IN still pushes)
    val plan = Retrieval.bm25TopKIndexed(spark, appended, terms, k = 15)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(token"), plan)
  }

  test("BM25 index on a zero-row corpus builds and probes empty") {
    val path = java.nio.file.Files
      .createTempDirectory("bm25_index_empty").toString
    Retrieval.writeBm25Index(docs.limit(0), path)
    assert(Retrieval.bm25IndexExists(spark, path))
    assert(Retrieval.bm25TopKIndexed(spark, path, Seq("x")).isEmpty)
  }

  // ---- hybrid RRF fusion ----------------------------------------------

  lazy val hybridDocs = Tables.documents(spark, "/root/testdata/sf0.001")
  lazy val hybridQs = Seq((0, "hash join merge"), (1, "filter scan"))
    .toDF("query_id", "query_text")

  test("hybrid RRF score is exactly Σ 1/(60+rank) of the sides' own ranks") {
    // recompute each side's ranks independently (bm25TopK per query +
    // a dense cosine rank), then check every fused row's rrf_score
    // and rank cut against them — the fusion adds no arithmetic of
    // its own beyond 1/(rrfK + rank)
    val n = 20
    val fused = Retrieval.hybridTopK(hybridDocs, hybridQs,
        k = 10, nPerSide = n)
      .collect()
    assert(fused.nonEmpty)
    val lexRanks: Map[(Int, Long), Int] =
      Seq(0 -> Seq("hash", "join", "merge"),
          1 -> Seq("filter", "scan")).flatMap { case (qid, terms) =>
        Retrieval.bm25TopK(hybridDocs, terms, k = n)
          .select("doc_id").as[Long].collect().zipWithIndex
          .map { case (d, i) => (qid, d) -> (i + 1) }
      }.toMap
    val denseRanks: Map[(Int, Long), Int] =
      Seq(0 -> "hash join merge", 1 -> "filter scan")
        .flatMap { case (qid, qtext) =>
          hybridDocs.select($"doc_id",
              round(graft.llm.Similarity.cosine(
                Retrieval.hashEmbed($"text"),
                Retrieval.hashEmbed(lit(qtext))), 4).as("c"))
            .orderBy($"c".desc, $"doc_id").limit(n)
            .select("doc_id").as[Long].collect().zipWithIndex
            .map { case (d, i) => (qid, d) -> (i + 1) }
        }.toMap
    fused.foreach { r =>
      val qid = r.getAs[Int]("query_id")
      val did = r.getAs[Long]("doc_id")
      val lex = lexRanks.get((qid, did))
      val den = denseRanks.get((qid, did))
      assert(Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Int])
        == lex, s"lex_rank mismatch at ($qid, $did)")
      assert(Option(r.getAs[Any]("dense_rank")).map(_.asInstanceOf[Int])
        == den, s"dense_rank mismatch at ($qid, $did)")
      val expected = BigDecimal(
          lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
          den.map(x => 1.0 / (60 + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf_score") - expected) < 1e-9,
        s"rrf mismatch at ($qid, $did)")
    }
  }

  test("a dense-only doc survives fusion with a null lexical rank") {
    // 'qqq' appears in no document: the lexical side is empty, so
    // every fused row must come from the dense side alone (hash-
    // bucket cosine is nonzero for any non-empty doc) with
    // rrf = 1/(60 + dense_rank)
    val qs = Seq((0, "qqq")).toDF("query_id", "query_text")
    val rows = Retrieval.hybridTopK(hybridDocs, qs, k = 5, nPerSide = 10)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("lex_rank")))
      val dr = r.getAs[Int]("dense_rank")
      val expected = BigDecimal(1.0 / (60 + dr))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf_score") - expected) < 1e-9)
    }
  }

  test("indexed hybrid ≡ live hybrid, row for row") {
    val path = java.nio.file.Files
      .createTempDirectory("bm25_index_hybrid").toString
    Retrieval.writeBm25Index(hybridDocs, path)
    val live = Retrieval.hybridTopK(hybridDocs, hybridQs,
        k = 10, nPerSide = 20)
      .orderBy("query_id", "rank").collect().toSeq
    val indexed = Retrieval.hybridTopKIndexed(spark, path, hybridDocs,
        hybridQs, k = 10, nPerSide = 20)
      .orderBy("query_id", "rank").collect().toSeq
    assert(live == indexed)

    // a small batch's distinct terms ride a pushed token IN into the
    // postings scan — the single-query probe's row-group pruning
    // survives batching below the threshold
    val plan = Retrieval.hybridTopKIndexed(spark, path, hybridDocs,
        hybridQs, k = 10, nPerSide = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("In(token"), plan)

    // above the threshold the term list must NOT ride the driver into
    // a literal filter — the plan joins instead (and still answers:
    // the over-threshold batch subsumes the small one's queries)
    val wide = (0 until Retrieval.Bm25BatchPushdownMaxTerms + 20)
      .map(i => (i, s"term$i hash merge")).toDF("query_id", "query_text")
    val widePlan = Retrieval.hybridTopKIndexed(spark, path, hybridDocs,
        wide, k = 5, nPerSide = 10)
      .queryExecution.executedPlan.toString
    assert(!widePlan.contains("In(token"), "term literals leaked into " +
      "the over-threshold plan")
    assert(Retrieval.hybridTopKIndexed(spark, path, hybridDocs, wide,
      k = 5, nPerSide = 10).count() > 0)
  }

  test("FULLY indexed hybrid ≡ live hybrid; query plan reads no doc text") {
    val bm25Path = java.nio.file.Files
      .createTempDirectory("bm25_index_full_hybrid").toString
    val densePath = java.nio.file.Files
      .createTempDirectory("dense_index_full_hybrid").toString
    Retrieval.writeBm25Index(hybridDocs, bm25Path)
    Retrieval.writeDenseIndex(hybridDocs, densePath)
    val live = Retrieval.hybridTopK(hybridDocs, hybridQs,
        k = 10, nPerSide = 20)
      .orderBy("query_id", "rank").collect().toSeq
    val full = Retrieval.hybridTopKFullyIndexed(spark, bm25Path,
        densePath, hybridQs, k = 10, nPerSide = 20)
      .orderBy("query_id", "rank").collect().toSeq
    assert(live == full)

    // the fully-indexed plan's file scans are ALL index tables — the
    // corpus text is out of the query path entirely
    val scanned = Retrieval.hybridTopKFullyIndexed(spark, bm25Path,
        densePath, hybridQs, k = 10, nPerSide = 20)
      .queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.mkString(",")
      }.mkString("\n")
    assert(scanned.linesIterator.forall(l =>
        l.contains(bm25Path) || l.contains(densePath)),
      s"non-index scan in fully-indexed hybrid plan:\n$scanned")
  }

  test("dense index append ≡ rebuild; compaction preserves probe rows") {
    val grown = java.nio.file.Files
      .createTempDirectory("dense_index_grow").toString
    val rebuilt = java.nio.file.Files
      .createTempDirectory("dense_index_rebuild").toString
    val bm25Path = java.nio.file.Files
      .createTempDirectory("bm25_index_grow").toString
    Retrieval.writeBm25Index(hybridDocs, bm25Path)
    Retrieval.writeDenseIndex(
      hybridDocs.filter($"doc_id" % 2 === 0), grown)
    Retrieval.appendToDenseIndex(
      hybridDocs.filter($"doc_id" % 2 === 1), grown)
    Retrieval.writeDenseIndex(hybridDocs, rebuilt)
    def probe(p: String) = Retrieval.hybridTopKFullyIndexed(
        spark, bm25Path, p, hybridQs, k = 10, nPerSide = 20)
      .orderBy("query_id", "rank").collect().toSeq
    assert(probe(grown) == probe(rebuilt),
      "appended dense index must probe identically to a rebuild")
    // idempotent replay: an append re-run with the SAME segment id
    // (the streaming arm's at-least-once window) must converge to
    // applied-once, never double-store the batch's vectors
    val clean = java.nio.file.Files
      .createTempDirectory("dense_index_clean").toString
    Retrieval.writeDenseIndex(
      hybridDocs.filter($"doc_id" % 2 === 0), clean)
    Retrieval.appendToDenseIndex(
      hybridDocs.filter($"doc_id" % 2 === 1), clean, segId = "b0")
    Retrieval.appendToDenseIndex(
      hybridDocs.filter($"doc_id" % 2 === 1), clean, segId = "b0")
    assert(probe(clean) == probe(rebuilt),
      "a replayed append (same segId) must converge, not double-count")
    Retrieval.compactDenseIndex(spark, clean)
    assert(probe(clean) == probe(rebuilt),
      "compaction must not change probe results")
    val segs = new java.io.File(s"$clean/vectors").listFiles()
      .filter(_.getName.startsWith("seg=")).map(_.getName).toSeq
    assert(segs == Seq("seg=base"), s"compaction left segments: $segs")
  }

  // ---- MMR diversification --------------------------------------------

  test("MMR picks the diverse candidate over the redundant higher-rel one") {
    // 1 and 2 are near-duplicates (cos ≈ 1 after round-4); 3 is
    // orthogonal with lower relevance. Pure relevance order is
    // (1, 2, 3); MMR at λ=0.7 must pick 3 second: for candidate 2,
    // 0.7·0.89 − 0.3·1.0 = 0.323 < 0.7·0.5 = 0.35.
    val cands = Seq(
      (1L, 0.9, Seq(1.0, 0.0)),
      (2L, 0.89, Seq(1.0, 0.01)),
      (3L, 0.5, Seq(0.0, 1.0))).toDF("doc_id", "rel", "vec")
    val got = Retrieval.mmrDiversify(cands, k = 5, lambda = 0.7)
      .as[(Long, Int, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 3L, 2L), got.toString)
    assert(got.map(_._2) == Seq(1, 2, 3))
    val scores = got.map(_._3)
    assert(math.abs(scores(0) - 0.63) < 1e-12)
    assert(math.abs(scores(1) - 0.35) < 1e-12)
    assert(math.abs(scores(2) - 0.323) < 1e-12)
  }

  test("MMR treats a zero-vector candidate as maximally diverse, not NaN") {
    // a zero hash-vector (empty chunk) used to crash the greedy with
    // BigDecimal(NaN); it must score sim 0 against everything instead
    val cands = Seq(
      (1L, 0.9, Seq(1.0, 0.0)),
      (2L, 0.8, Seq(0.0, 0.0)),
      (3L, 0.7, Seq(1.0, 0.01))).toDF("doc_id", "rel", "vec")
    val got = Retrieval.mmrDiversify(cands, k = 3, lambda = 0.7)
      .as[(Long, Int, Double)].collect().toSeq
    // zero-vec doc 2: maxSim stays 0 -> 0.7*0.8 = 0.56 beats doc 3's
    // redundancy-penalized 0.7*0.7 - 0.3*1.0
    assert(got.map(_._1) == Seq(1L, 2L, 3L), got.toString)
  }

  test("MMR exhausts short candidate sets and rejects unbounded ones") {
    val three = Seq(
      (1L, 0.9, Seq(1.0, 0.0)),
      (2L, 0.8, Seq(0.0, 1.0)),
      (3L, 0.7, Seq(1.0, 1.0))).toDF("doc_id", "rel", "vec")
    assert(Retrieval.mmrDiversify(three, k = 10).count() == 3)

    val wide = (1L to 10L).map(i => (i, 0.5, Seq(i.toDouble, 1.0)))
      .toDF("doc_id", "rel", "vec")
    val e = intercept[IllegalArgumentException] {
      Retrieval.mmrDiversify(wide, k = 2, maxCandidates = 5)
    }
    assert(e.getMessage.contains("bounded"))
  }
}
