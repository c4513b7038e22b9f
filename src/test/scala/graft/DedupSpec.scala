package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog again and again today"
  lazy val docs = Seq(
    (1L, base),
    (2L, base), // exact dup of 1
    (3L, base.replace("today", "tomorrow")), // near dup of 1
    (4L, "completely different content about spark query engines and scale"),
    (5L, "unrelated short text")
  ).toDF("doc_id", "text")

  test("exact dedup: stats and representatives") {
    val stats = Dedup.exactStats(docs).head()
    assert(stats.getAs[Long]("total_docs") == 5)
    assert(stats.getAs[Long]("distinct_docs") == 4)
    assert(stats.getAs[Long]("exact_dups") == 1)
    val keep = Dedup.exactDedup(docs).orderBy("keep_id")
      .as[(Long, Long)].collect().toSeq
    assert(keep == Seq((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("jaccard on shingle sets") {
    val j = docs.filter($"doc_id".isin(1, 3))
      .agg(collect_list(Dedup.shingles($"text")).as("s"))
      .select(Dedup.jaccard(element_at($"s", 1), element_at($"s", 2)))
      .head().getDouble(0)
    assert(j > 0.6 && j < 1.0)
    val self = docs.limit(1)
      .select(Dedup.jaccard(Dedup.shingles($"text"), Dedup.shingles($"text")))
      .head().getDouble(0)
    assert(self == 1.0)
  }

  test("minhash LSH finds exact+near dups, not unrelated docs") {
    val pairs = Dedup.nearDupMinhash(docs, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("minhash LSH pairs on fixture corpus are true near-dups") {
    val found = Dedup.nearDupMinhash(
      Tables.documents(spark, TestSpark.sf0001), minJaccard = 0.7)
    // every reported pair carries its EXACT jaccard (verified ≥ 0.7 by
    // construction); assert the planted near-dups exist and are real
    val n = found.count()
    assert(n > 0, "synthetic corpus contains planted near-dups")
    assert(found.agg(min("jaccard")).head().getDouble(0) >= 0.7)
  }

  test("bucket cap defuses a degenerate corpus of identical docs") {
    // 1000 identical documents: every band collapses into ONE bucket
    // of 1000 → an uncapped self-join would emit ~500k pairs per band.
    // With the cap the oversized buckets are dropped wholesale and the
    // planted small-bucket pair is still found.
    val degenerate = (1 to 1000).map(i => (i.toLong, base))
      .toDF("doc_id", "text")
      .union(Seq(
        (2001L, "some other niche text about distributed query engines " +
          "running at very large scale with columnar storage and codegen today"),
        (2002L, "some other niche text about distributed query engines " +
          "running at very large scale with columnar storage and codegen tomorrow"))
        .toDF("doc_id", "text"))
    val pairs = Dedup.nearDupMinhash(degenerate,
      minJaccard = 0.5, maxBucketSize = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 <= 1000L && p._2 <= 1000L),
      "capped bucket must contribute no pairs")
    assert(pairs.contains((2001L, 2002L)),
      "small buckets keep working under the cap")
    // and the audit names the culprit buckets
    val over = Dedup.oversizedBuckets(degenerate, cap = 100)
      .agg(max("n")).head().getLong(0)
    assert(over == 1000L)
  }

  test("simhash: identical docs equal, near-dups close, unrelated far") {
    val sig = Dedup.simhashes(docs).as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(2L))
    val hammingNear = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
    val hammingFar = java.lang.Long.bitCount(sig(1L) ^ sig(4L))
    assert(hammingNear < hammingFar)
    assert(hammingNear <= 16)
    val pairs = Dedup.nearDupSimhash(docs, maxHamming = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash codegen and interpreted paths agree") {
    val viaExpr = Dedup.simhashes(docs).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    // force interpreted eval through a fresh expression instance
    import graft.functions.SimHash64
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val interpreted = docs.orderBy("doc_id").collect().map { r =>
      val toks = r.getString(1).toLowerCase.trim.split("\\s+")
      val arr = ArrayData.toArrayData(toks.map(UTF8String.fromString))
      (r.getLong(0),
        SimHash64(org.apache.spark.sql.catalyst.expressions.Literal(arr,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
          .nullSafeEval(arr).asInstanceOf[Long])
    }.toSeq
    assert(viaExpr == interpreted)
  }

  test("contamination: planted benchmark overlap is flagged, clean docs are not") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "entirely different evaluation material nothing shared here"))
      .toDF("doc_id", "text")
    val probe = Seq(
      // contains an 8-word run of bench doc 100
      (1L, "prefix words then the quick brown fox jumps over the lazy suffix"),
      // shares words but never 8 consecutive
      (2L, "quick fox dog lazy brown the over jumps scrambled order words"),
      (3L, "completely unrelated training document with its own content"))
      .toDF("doc_id", "text")
    val out = Dedup.contaminationHits(probe, bench, k = 8)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L),
      s"only the planted 8-gram overlap should flag: $out")
  }

  test("ngram jaccard pairs verifier") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccardPairs(docs, pairs)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.head == ((2L, 1L, 1.0)) || out.head == ((1L, 2L, 1.0))
      || out.head._3 == 1.0)
    assert(out.last._3 == 0.0)
  }

  test("connected components: chain needs multiple propagation rounds") {
    // 1-2-3-4-5 is one component (diameter 4 forces >1 iteration);
    // 10-11 is another; 20-21-22 a triangle
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(labels(_) == 1L),
      s"chain not fully merged: $labels")
    assert(labels(10L) == 10L && labels(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(labels(_) == 20L))
    assert(labels.size == 10)
  }

  test("components fast path == distributed path; 0 rounds, converged") {
    // chain + pair + triangle (the multi-round graph above): the
    // driver union-find must produce byte-identical labels to the
    // propagation loop, in zero propagation rounds
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("id_a", "id_b")
    val fast = Dedup.connectedComponentsWithStats(pairs)
    assert(fast.converged && fast.iterations == 0,
      s"small graph should take the collect path: $fast")
    val slow =
      Dedup.connectedComponentsWithStats(pairs, collectThreshold = 0)
    assert(fast.labels.as[(Long, Long)].collect().toMap ==
      slow.labels.as[(Long, Long)].collect().toMap)
  }

  test("components drop null-id edges identically on both strategies") {
    val pairs = Seq(
      (Some(1L), Some(2L)),
      (Some(2L), Option.empty[Long]), // corrupt: must not create a null node
      (Option.empty[Long], Some(9L)),
      (Some(5L), Some(6L))
    ).toDF("id_a", "id_b")
    for (thr <- Seq(Dedup.DefaultCcCollectThreshold, 0L)) {
      val labels = Dedup
        .connectedComponentsWithStats(pairs, collectThreshold = thr)
        .labels.as[(Long, Long)].collect().toMap
      assert(labels == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L),
        s"threshold=$thr: $labels")
    }
  }

  test("components fast path == distributed on random graphs (seeded)") {
    // three deterministic random edge lists spanning sparse (many
    // small components), dense (few big ones), and self-loop/dup-edge
    // noise — the fast path must agree with the propagation loop on
    // every node's label, not just the hand-built shapes above
    val rnd = new scala.util.Random(12L)
    for ((nNodes, nEdges) <- Seq((40, 25), (40, 120), (15, 60))) {
      val pairs = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .toDF("id_a", "id_b")
      val fast = Dedup.connectedComponentsWithStats(pairs)
      val slow =
        Dedup.connectedComponentsWithStats(pairs, collectThreshold = 0)
      assert(fast.iterations == 0 && fast.converged)
      assert(fast.labels.as[(Long, Long)].collect().toMap ==
        slow.labels.as[(Long, Long)].collect().toMap,
        s"fast/distributed divergence on n=$nNodes e=$nEdges")
    }
  }

  test("components fast path: string ids, min label is lexicographic") {
    val pairs = Seq(
      ("doc-b", "doc-a"), ("doc-b", "doc-c"), // one component, min doc-a
      ("zz-2", "zz-1")
    ).toDF("id_a", "id_b")
    val res = Dedup.connectedComponentsWithStats(pairs)
    assert(res.iterations == 0)
    val labels = res.labels.as[(String, String)].collect().toMap
    assert(Seq("doc-a", "doc-b", "doc-c").forall(labels(_) == "doc-a"))
    assert(labels("zz-1") == "zz-1" && labels("zz-2") == "zz-1")
  }

  test("clean corpus (zero near-dup pairs): cluster ops return, not NPE") {
    // every doc unique → the LSH pair graph is EMPTY; sum over an empty
    // labels frame is null, which used to NPE in the convergence check
    val clean = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "completely different content about spark query engines")
    ).toDF("doc_id", "text")
    val kept = Dedup.clusterDedup(clean, minJaccard = 0.5)
    assert(kept.count() == 3, "nothing to dedup: all docs kept")
    val stats = Dedup.dupClusterStats(clean, minJaccard = 0.5).head()
    assert(stats.getAs[Long]("n_docs") == 3)
    assert(stats.getAs[Long]("n_clusters") == 0)
    assert(stats.getAs[Long]("n_clustered_docs") == 0)
    assert(stats.getAs[Long]("max_cluster") == 0)
    // and the components primitive itself on an explicitly empty graph
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val res = Dedup.connectedComponentsWithStats(empty)
    assert(res.labels.count() == 0 && res.converged)
  }

  test("components lineage stays O(1) across propagation rounds") {
    // a diameter-9 chain forces many rounds; localCheckpoint per round
    // must leave the final labels' analyzed plan a single leaf, not a
    // tree that grew with the iteration count
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val res =
      Dedup.connectedComponentsWithStats(chain, collectThreshold = 0)
    assert(res.converged && res.iterations > 3)
    val planNodes = res.labels.queryExecution.analyzed.collect { case p => p }
    assert(planNodes.size <= 2,
      s"lineage not truncated: ${planNodes.size} plan nodes after " +
        s"${res.iterations} rounds")
    assert(res.labels.as[(Long, Long)].collect().toMap
      .forall(_._2 == 1L))
  }

  test("non-convergence (diameter > maxIters) is signalled, not silent") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val res = Dedup.connectedComponentsWithStats(chain, maxIters = 2,
      collectThreshold = 0)
    assert(!res.converged && res.iterations == 2)
    // truncated labels: the far end of the chain can't have reached 1
    val labels = res.labels.as[(Long, Long)].collect().toMap
    assert(labels.values.toSet.size > 1,
      "2 rounds cannot collapse a diameter-11 chain to one label")
  }

  test("keep-one-per-cluster transitivity: A~B~C collapses to one keeper") {
    // A and C share nothing pairwise, but both overlap B heavily:
    // pairwise keep-one would keep 2 of {A,B,C}; components keep 1.
    val triad = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "eta theta iota kappa alpha beta")
    ).toDF("doc_id", "text")
    val pairs = Dedup.nearDupMinhash(triad, minJaccard = 0.3,
      numHashes = 64, bands = 32)
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet.size == 1,
      s"triad should be one cluster: $labels")
  }

  test("decontaminate drops exactly the flagged docs, keeps the rest") {
    val bench = Seq((100L, "secret benchmark question about spark engines"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "innocent text with no overlap whatsoever here"),
      (2L, "leaked copy of the secret benchmark question about spark"),
      (3L, "another clean training document entirely")
    ).toDF("doc_id", "text")
    val kept = Dedup.decontaminate(train, bench, k = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    // empty bench drops nothing
    assert(Dedup.decontaminate(train, bench.filter(lit(false)), k = 4)
      .count() == 3)
  }

  test("incremental dedup: exact and near drops against a frozen reference") {
    val reference = Seq(
      (10L, base),
      (11L, "completely different content about spark query engines and scale"),
      (12L, "unrelated short text")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (20L, base), // exact copy of ref 10 → phase-1 drop
      (21L, base.replace("today", "tomorrow")), // near dup of ref 10 → phase-2 drop
      (22L, "a genuinely fresh document with entirely new words inside")
    ).toDF("doc_id", "text")

    val kept = Dedup.incrementalDedup(incoming, reference)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(22L))

    val audit = Dedup.incrementalDedupAudit(incoming, reference).head()
    assert(audit.getAs[Long]("n_incoming") == 3)
    assert(audit.getAs[Long]("n_exact_dropped") == 1)
    assert(audit.getAs[Long]("n_near_dropped") == 1)
    assert(audit.getAs[Long]("n_kept") == 1)

    // dedup against an empty reference keeps everything (both phases
    // must survive an empty build side)
    val emptyRef = reference.filter(lit(false))
    assert(Dedup.incrementalDedup(incoming, emptyRef).count() == 3)
    // and an empty incoming batch yields an all-zero audit, not a crash
    val zero = Dedup.incrementalDedupAudit(
      incoming.filter(lit(false)), reference).head()
    assert(zero.getAs[Long]("n_incoming") == 0)
    assert(zero.getAs[Long]("n_kept") == 0)
  }

  test("persisted LSH index: probe matches the live incremental path") {
    val reference = Seq(
      (10L, base),
      (11L, "completely different content about spark query engines and scale"),
      (12L, "unrelated short text")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (20L, base), // exact copy of ref 10 → phase-1 drop
      (21L, base.replace("today", "tomorrow")), // near dup → phase-2 drop
      (22L, "a genuinely fresh document with entirely new words inside")
    ).toDF("doc_id", "text")
    val path = "target/test_lsh_index_" + System.nanoTime()

    assert(!Dedup.lshIndexExists(spark, path))
    Dedup.writeLshIndex(reference, path)
    assert(Dedup.lshIndexExists(spark, path))

    val (kept, audit0) =
      Dedup.incrementalDedupIndexedWithAudit(incoming, path)
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(22L))
    val audit = audit0.head()
    assert(audit.getAs[Long]("n_incoming") == 3)
    assert(audit.getAs[Long]("n_exact_dropped") == 1)
    assert(audit.getAs[Long]("n_near_dropped") == 1)
    assert(audit.getAs[Long]("n_kept") == 1)

    // empty incoming batch → all-zero audit, not a crash
    val zero = Dedup.incrementalDedupIndexedWithAudit(
      incoming.filter(lit(false)), path)._2.head()
    assert(zero.getAs[Long]("n_incoming") == 0)
    assert(zero.getAs[Long]("n_kept") == 0)

    // probing a path with no index fails loudly, not with a read error
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalDedupIndexed(incoming, path + "_nope").count()
    }
    assert(e.getMessage.contains("writeLshIndex"))
  }

  test("LSH index append ≡ rebuild over the grown reference") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text")
    val baseRef = docs.filter($"doc_id" % 4 === 0)
    val lateRef = docs.filter($"doc_id" % 4 === 2)
    val incoming = docs.filter($"doc_id" % 2 === 1)
      .unionByName(docs.filter($"doc_id" % 2 === 0)
        .filter($"doc_id" < 20)
        .withColumn("doc_id", $"doc_id" + 1000000L))

    val appended = "target/test_lsh_append_" + System.nanoTime()
    Dedup.writeLshIndex(baseRef, appended)
    Dedup.appendToLshIndex(lateRef, appended, segId = "late1")
    val rebuilt = "target/test_lsh_rebuilt_" + System.nanoTime()
    Dedup.writeLshIndex(baseRef.unionByName(lateRef), rebuilt)

    def audit(p: String) =
      Dedup.incrementalDedupIndexedWithAudit(incoming, p)._2
        .head().toString
    assert(audit(appended) == audit(rebuilt))
    // the summed bucket counts themselves are exact, not just probes
    def counts(p: String) = spark.read.parquet(s"$p/bucket_counts")
      .groupBy("band", "band_hash").agg(sum($"n").as("n"))
    val diff = counts(appended).exceptAll(counts(rebuilt)).count()
    assert(diff == 0, s"bucket_counts differ in $diff rows")

    // REPLAY idempotency (the streaming arm's at-least-once window):
    // re-running the same append with the same segment id must leave
    // the index identical, not doubled
    val bandsBefore = spark.read.parquet(s"$appended/bands").count()
    Dedup.appendToLshIndex(lateRef, appended, segId = "late1")
    assert(spark.read.parquet(s"$appended/bands").count() == bandsBefore,
      "replaying an append duplicated band rows")
    assert(audit(appended) == audit(rebuilt))

    // compaction restores the canonical single-segment layout: every
    // table equals the rebuild's, row for row (seg column included —
    // both are 'base' after compaction)
    Dedup.compactLshIndex(spark, appended)
    for (t <- Seq("digests", "bands", "shingles", "bucket_counts")) {
      val d = spark.read.parquet(s"$appended/$t")
        .exceptAll(spark.read.parquet(s"$rebuilt/$t")).count()
      val d2 = spark.read.parquet(s"$rebuilt/$t")
        .exceptAll(spark.read.parquet(s"$appended/$t")).count()
      assert(d == 0 && d2 == 0, s"$t differs after compaction: +$d -$d2")
    }
    assert(audit(appended) == audit(rebuilt))

    // appending to a missing index fails loudly
    val e = intercept[IllegalArgumentException] {
      Dedup.appendToLshIndex(lateRef, appended + "_nope")
    }
    assert(e.getMessage.contains("writeLshIndex"))
  }

  test("LSH index append of an already-indexed doc: probe unchanged, compact dedups") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text")
    val reference = docs.filter($"doc_id" < 100)
    val incoming = docs.filter($"doc_id" >= 100 && $"doc_id" < 120)
    val path = "target/test_lsh_redigest_" + System.nanoTime()
    Dedup.writeLshIndex(reference, path)
    val before = Dedup.incrementalDedupIndexedWithAudit(incoming, path)
      ._2.head().toString
    // append a doc whose TEXT is already indexed (same digest, new id):
    // the digests table gains a cross-segment duplicate row —
    // documented in appendToLshIndex — but the exact phase is an
    // anti-join (membership), so probes are unchanged
    val dup = reference.filter($"doc_id" === 7)
      .withColumn("doc_id", $"doc_id" + 500000L)
    Dedup.appendToLshIndex(dup, path)
    val digests = spark.read.parquet(s"$path/digests")
    assert(digests.count() == digests.select("digest").distinct().count() + 1,
      "expected exactly one cross-segment duplicate digest")
    assert(Dedup.incrementalDedupIndexedWithAudit(incoming, path)
      ._2.head().toString == before, "probe changed after re-digest append")
    // compaction restores global distinctness
    Dedup.compactLshIndex(spark, path)
    val after = spark.read.parquet(s"$path/digests")
    assert(after.count() == after.select("digest").distinct().count())
    assert(Dedup.incrementalDedupIndexedWithAudit(incoming, path)
      ._2.head().toString == before)
  }

  test("persisted LSH index: probe ≡ live path on a planted corpus slice") {
    // 30 docs with overlapping shingle structure + planted exact and
    // near dups — the indexed probe must return EXACTLY the live
    // incrementalDedup's kept set (same phases, same thresholds)
    val reference = (0L until 30L).map(i =>
      (i, s"reference document number $i with shared vocabulary words " +
        s"alpha beta gamma ${"filler " * (i % 5).toInt}token$i"))
      .toDF("doc_id", "text")
    val incoming = ((100L until 115L).map(i =>
      (i, s"incoming fresh document $i with novel content entirely " +
        s"different words omega sigma token$i")) ++
      Seq((200L, "reference document number 7 with shared vocabulary words " +
        "alpha beta gamma filler filler token7"), // exact copy of ref 7
        (201L, "reference document number 8 with shared vocabulary words " +
          "alpha beta gamma filler filler filler token8 extra"))) // near dup
      .toDF("doc_id", "text")
    val path = "target/test_lsh_index_" + System.nanoTime()
    Dedup.writeLshIndex(reference, path)
    val live = Dedup.incrementalDedup(incoming, reference)
      .select("doc_id").as[Long].collect().toSet
    val indexed = Dedup.incrementalDedupIndexed(incoming, path)
      .select("doc_id").as[Long].collect().toSet
    assert(indexed == live, s"indexed=$indexed live=$live")
  }

  // ---- cache lifecycle contract --------------------------------------
  // The probe frames below reconstruct EXACTLY the plans the operators
  // persist internally (same column aliases, same shingle params), so
  // Dataset.storageLevel — which looks the canonicalized plan up in the
  // session CacheManager — is a precise public detector of whether an
  // operator left its intermediate behind.

  private def shingleProbe(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id").as("jid"), Dedup.shingles(col("text"), 3).as("jsh"))

  test("withNearDupPairs / nearDupPairsMaterialized leave no cache behind") {
    import org.apache.spark.storage.StorageLevel
    spark.catalog.clearCache() // earlier tests use the unscoped variant
    val n = Dedup.withNearDupPairs(docs, minJaccard = 0.5)(_.count())
    assert(n >= 1)
    assert(shingleProbe(docs).storageLevel == StorageLevel.NONE,
      "scoped variant must unpersist the shingle cache")
    val pairs = Dedup.nearDupPairsMaterialized(docs, minJaccard = 0.5)
    assert(pairs.count() >= 1)
    assert(shingleProbe(docs).storageLevel == StorageLevel.NONE,
      "materialized variant must unpersist the shingle cache")
    // the pairs stay usable AFTER release — they are a checkpoint, not
    // a view over the dropped caches
    assert(pairs.select("id_a").count() == pairs.count())
  }

  test("plain nearDupMinhash keeps its documented session-cache contract") {
    import org.apache.spark.storage.StorageLevel
    val pairs = Dedup.nearDupMinhash(docs, minJaccard = 0.5)
    pairs.count()
    assert(shingleProbe(docs).storageLevel != StorageLevel.NONE,
      "unscoped variant caches the shingles for reuse (LSH-model contract)")
    spark.catalog.clearCache()
  }

  test("scoped release never steals a cache a prior caller owns") {
    import org.apache.spark.storage.StorageLevel
    val mine = shingleProbe(docs).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      mine.count()
      // the scope finds the identical plan already cached (persistIfNew
      // → no handle), reuses it, and must NOT unpersist it on exit
      Dedup.withNearDupPairs(docs, minJaccard = 0.5)(_.count())
      assert(mine.storageLevel != StorageLevel.NONE,
        "pre-existing cache must survive a scoped call over the same plan")
    } finally { mine.unpersist(true); () }
  }

  test("cluster ops and the incremental family leave no cache behind") {
    import org.apache.spark.storage.StorageLevel
    spark.catalog.clearCache()
    Dedup.dupClusterStats(docs, minJaccard = 0.5).head()
    // dupClusterStats runs nearDupMinhash at numHashes=64/bands=32 over
    // the same shingled plan — probe must be cold afterwards
    assert(shingleProbe(docs).storageLevel == StorageLevel.NONE)
    val reference = Seq((10L, base)).toDF("doc_id", "text")
    val (kept, audit) = Dedup.incrementalDedupWithAudit(docs, reference)
    assert(audit.head().getAs[Long]("n_incoming") == 5)
    assert(kept.count() == audit.head().getAs[Long]("n_kept"))
    // refSh inside incrementalPhases shingles the reference frame with
    // exactly the probe's plan — it must be released on return
    assert(shingleProbe(reference).storageLevel == StorageLevel.NONE,
      "incremental phases must release their persisted frames")
  }

  test("cross-source provenance: dup pairs land on the right source pair") {
    val srcDocs = Seq(
      (1L, base, "crawl_a"),
      (2L, base, "crawl_b"),                       // cross-source exact dup
      (3L, base.replace("today", "tomorrow"), "crawl_b"), // near dup of 1
      (4L, "totally different content entirely here", "crawl_a"),
      (5L, "another unrelated document text", "crawl_b")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDupStats(srcDocs, minJaccard = 0.5)
      .orderBy("source_x", "source_y")
      .as[(String, String, Long, Double, Long)].collect().toSeq
    // pairs: (1,2) a-b, (1,3) a-b, (2,3) b-b — sorted source pairs
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq(("crawl_a", "crawl_b", 2L), ("crawl_b", "crawl_b", 1L)), got)
    assert(got.forall(_._4 >= 0.5))
    // the gate's integer surface must be consistent with the API float:
    // sum_e4 / 1e4 / n_pairs reproduces avg_jaccard to display precision
    assert(got.forall(r =>
      math.abs(r._5 / 10000.0 / r._3 - r._4) < 1e-3), got)
  }

  test("containment finds the quoted short doc Jaccard-LSH misses") {
    // doc 10 (8 tokens, 6 trigrams) is quoted whole inside doc 11's
    // much longer text: containment(10 in 11) = 1.0, but Jaccard is
    // 6/56 ≈ 0.11 — below any useful near-dup threshold
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (1 to 50).map(i => s"w$i").mkString(" ")
    val cdocs = Seq(
      (10L, quote),
      (11L, s"$filler $quote"),
      (12L, "entirely unrelated content about other things here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(cdocs, minContainment = 0.8)
      .select("id_a", "id_b", "containment")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((10L, 11L)), pairs.toString)
    assert(pairs.head._3 == 1.0, pairs.toString)
    // the symmetric Jaccard detector does NOT see this pair
    val jpairs = Dedup.nearDupMinhash(cdocs, minJaccard = 0.5,
      numHashes = 64, bands = 32)
    assert(jpairs.count() == 0L, "jaccard near-dup must miss the quotation")
    // act step: the short contained doc is dropped, the container kept
    val kept = Dedup.containmentDedup(cdocs, minContainment = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 12L), kept.toString)
  }

  test("containment act step: mutual containment keeps the lower id, chains keep the largest") {
    val t = "one two three four five six seven eight nine ten"
    val cdocs = Seq(
      (20L, t), (21L, t), // exact pair: mutual containment 1.0
      (30L, "aa bb cc dd ee"),
      (31L, s"aa bb cc dd ee ff gg hh"),
      (32L, s"aa bb cc dd ee ff gg hh ii jj kk ll")
    ).toDF("doc_id", "text")
    val kept = Dedup.containmentDedup(cdocs, minContainment = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(20L) && !kept.contains(21L),
      s"equal-size mutual containment keeps the lower id: $kept")
    assert(kept.intersect(Set(30L, 31L, 32L)) == Set(32L),
      s"a containment chain keeps only the largest: $kept")
  }

  test("sourceSimilarity: signature estimate tracks exact jaccard") {
    // source A and B share half their text; C is disjoint
    val shared = (1 to 30).map(i => s"common$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared ${(1 to 30).map(i => s"a$i").mkString(" ")}", "srcA"),
      (2L, s"$shared ${(1 to 30).map(i => s"b$i").mkString(" ")}", "srcB"),
      (3L, (1 to 60).map(i => s"c$i").mkString(" "), "srcC")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceSimilarity(docs, numHashes = 128, tolerance = 0.15)
      .as[(String, String, Long, Long, Double, Boolean)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) ==
      Seq(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")), got.toString)
    val byPair = got.map(r => (r._1, r._2) -> r).toMap
    // A∩B ≈ 28 shared trigrams of ~119 union → j ≈ 0.3; disjoint pairs 0
    assert(byPair(("srcA", "srcB"))._5 > 0.15, got.toString)
    assert(byPair(("srcA", "srcC"))._5 == 0.0, got.toString)
    assert(byPair(("srcB", "srcC"))._5 == 0.0, got.toString)
    assert(got.forall(_._6), s"every estimate within tolerance: $got")
  }

  test("containment df cap drops boilerplate shingles from the measure") {
    // two docs share ONLY a boilerplate phrase; with the cap at 1 the
    // shared shingles (df=2) are excluded, so no pair survives
    val cdocs = Seq(
      (40L, "copyright all rights reserved contact us"),
      (41L, "copyright all rights reserved contact us plus unique content here today")
    ).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(cdocs, minContainment = 0.5,
      maxShingleDf = 1).count() == 0L)
    assert(Dedup.containmentPairs(cdocs, minContainment = 0.5,
      maxShingleDf = 1000).count() >= 1L)
  }
}
