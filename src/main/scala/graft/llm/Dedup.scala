package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SimHash64.simhash64

/** Deduplication operators for training-data curation, all bucketed —
  * no O(n²) all-pairs stage anywhere, which is what makes them viable
  * at 100 TB / 1000 executors:
  *
  *  - exact: hash-groupBy on a 256-bit content digest (one shuffle on
  *    the digest; map-side partial aggregation applies);
  *  - MinHash+LSH: shingle → H minhashes → b bands → shuffle by
  *    (band, bandHash) → pairs only within buckets → exact-Jaccard
  *    verify on candidates only;
  *  - SimHash: 64-bit signature (custom codegen expression), candidates
  *    = equal 16-bit sub-bands (4 buckets/doc), verified by Hamming
  *    distance;
  *  - n-gram Jaccard: the exact verifier, exposed standalone.
  *
  * The reference has no dedup at all; these are the brief-mandated
  * extension ops (project brief + SURVEY §7 llm/).
  */
object Dedup {

  // ---- exact --------------------------------------------------------

  /** Content digest for exact dedup: SHA-256 of the raw text. */
  def contentHash(text: Column): Column = sha2(text.cast("string"), 256)

  /** Exact-duplicate stats: total vs distinct digests. */
  def exactStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.agg(
      count(lit(1)).as("total_docs"),
      countDistinct(contentHash(col(textCol))).as("distinct_docs"),
      (count(lit(1)) - countDistinct(contentHash(col(textCol))))
        .as("exact_dups"))

  /** Keep-one-per-content-group: representative = min doc id. One
    * shuffle on the digest. Returns (keep_id, n_copies). */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .groupBy(contentHash(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  // ---- shingling ----------------------------------------------------

  /** k-word shingles of the lowercased text (distinct set), via the
    * codegen WordShingles expression (graft.functions.TextExprs). */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.TextExprs.word_shingles(split(lower(trim(text)), "\\s+"), k)

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  // ---- bucket-size guard ---------------------------------------------

  /** Drop LSH buckets larger than `cap` before a bucket self-join.
    *
    * Every in-bucket self-join is quadratic in bucket size: fine for
    * real corpora (bands spread ~uniformly), degenerate for a hostile
    * or pathological input (millions of identical documents collapse
    * into ONE bucket and pin a single reducer with n²/2 pairs). Exact
    * dedup upstream is the semantic mitigation; this cap is the
    * operational one — a bucket over the cap is dropped wholesale.
    * Dropping loses only pairs a capped bucket would have contributed;
    * near-identical members of a huge bucket are exactly what exact
    * dedup already collapses. Use [[oversizedBuckets]] to audit what a
    * given cap would drop.
    *
    * The size count runs as a window over the same keys the self-join
    * shuffles on, so the plan pays no extra exchange.
    */
  private[llm] def capBuckets(
      df: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    df.withColumn("__graft_bucket_n", count(lit(1)).over(w))
      .filter(col("__graft_bucket_n") <= cap)
      .drop("__graft_bucket_n")
  }

  /** Audit companion to the cap: (bucket keys, n) for every MinHash
    * band bucket exceeding `cap` — run it when a capped
    * `nearDupMinhash` needs an account of what was skipped. */
  def oversizedBuckets(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      cap: Int = defaultMaxBucket): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(shingles(col(textCol), shingleK).as("sh"))
      .select(posexplode(graft.functions.TextExprs.minhash_bands(
        col("sh"), numHashes, bands)).as(Seq("band", "band_hash")))
      .groupBy("band", "band_hash")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > cap)
  }

  /** Default self-join bucket cap: 4096² / 2 ≈ 8.4M candidate pairs
    * from a single worst-case bucket — heavy but bounded. */
  val defaultMaxBucket: Int = 4096

  // ---- cache lifecycle ----------------------------------------------

  /** Persist `df` at `level` unless an identical plan is ALREADY in
    * the session cache (`Dataset.storageLevel` does the
    * canonicalized-plan lookup). Returns the frame plus `Some(frame)`
    * when THIS call created the entry — the unpersist handle — and
    * `None` when an earlier caller owns it: re-persisting would only
    * log CacheManager "already cached" noise, and stealing the
    * unpersist would drop a cache a still-live plan reads. */
  private[llm] def persistIfNew(
      df: DataFrame,
      level: org.apache.spark.storage.StorageLevel)
      : (DataFrame, Option[DataFrame]) =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      (df.persist(level), Some(df))
    else (df, None)

  /** Non-blocking unpersist of the cache entries a tracked operator
    * created. Non-blocking is deliberate: eviction proceeds while the
    * caller's next job starts, and any in-flight reader just
    * recomputes from lineage. */
  private[llm] def release(handles: Seq[DataFrame]): Unit =
    handles.foreach(_.unpersist(false))

  // ---- MinHash + LSH ------------------------------------------------

  /** H-permutation MinHash signature of a shingle array. Permutation i
    * is simulated by seeding xxhash64 with i (standard single-hash
    * MinHash variant). */
  def minhashSignature(shingleCol: Column, numHashes: Int = 32): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(shingleCol, sh => xxhash64(lit(i), sh)))): _*)

  /** Near-duplicate pairs via banded LSH over MinHash signatures.
    *
    * numHashes = bands * rowsPerBand. Two docs collide in a band iff
    * that band of the signature matches exactly; collision probability
    * is 1-(1-j^r)^b for Jaccard j — with 32/8/4 the curve crosses ~0.7.
    * Candidates are verified with exact Jaccard, so false positives
    * cost compute, never correctness.
    *
    * Scale: explode is b rows/doc; the shuffle key (band, bandHash)
    * spreads uniformly; in-bucket self-join only — never a cross join.
    * Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ minJaccard.
    */
  def nearDupMinhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      minJaccard: Double = 0.7,
      maxBucketSize: Int = defaultMaxBucket,
      persistIntermediates: Boolean = true): DataFrame =
    nearDupMinhashTracked(docs, idCol, textCol, shingleK, numHashes,
      bands, minJaccard, maxBucketSize, persistIntermediates)._1

  /** [[nearDupMinhash]] plus the unpersist handles for every session-
    * cache entry THIS call created — the cache-lifecycle primitive the
    * scoped/materialized wrappers and the cluster-family operators
    * build on. Callers must not release the handles before the
    * returned pairs frame's terminal action (the verify join reads the
    * shingle cache). */
  private[llm] def nearDupMinhashTracked(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      minJaccard: Double = 0.7,
      maxBucketSize: Int = defaultMaxBucket,
      persistIntermediates: Boolean = true)
      : (DataFrame, Seq[DataFrame]) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val handles = Seq.newBuilder[DataFrame]

    // Shingle ONCE, share between banding and verify. Without the
    // persist Catalyst inlines this subtree into both consumers and
    // the corpus is tokenized+shingled three times (banding + each
    // verify side — the dominant scalar work in the pipeline).
    // MEMORY_AND_DISK so a 100 TB corpus spills instead of OOMing;
    // pass persistIntermediates=false to trade the recompute for zero
    // cache footprint. When the pairs frame outlives this call (the
    // plain nearDupMinhash path) the persisted plans stay in the
    // session cache until LRU eviction — same contract as Spark ML's
    // LSH models; callers that consume the pairs promptly should use
    // [[withNearDupPairs]] or [[nearDupPairsMaterialized]], which
    // unpersist these entries instead of leaving them to accumulate
    // across a long session (the round-8 bench pathology).
    val shingled0 = docs.select(
      col(idCol).as("jid"), shingles(col(textCol), shingleK).as("jsh"))
    val shingled = if (persistIntermediates) {
      val (df, h) = persistIfNew(shingled0, level)
      handles ++= h; df
    } else shingled0

    // Banded signature in ONE codegen pass per doc (minhash_bands):
    // every permutation minimum computed exactly once. The band
    // shuffle carries only (band, band_hash, id) — 24 bytes a row,
    // never the shingle arrays; shingles are joined back for the
    // verify step on the (small) candidate set only.
    val banded = shingled.select(col("jid").as("id"),
      posexplode(graft.functions.TextExprs.minhash_bands(
        col("jsh"), numHashes, bands)).as(Seq("band", "band_hash")))

    // The capped band list is also persisted (when enabled): the
    // self-join consumes it twice, and reading from an InMemoryRelation
    // defeats AQE's identical-exchange reuse (canonicalized-plan
    // matching), so without this second (tiny: id + band + hash per
    // row) cache the 64-hash minhash pass would execute once per join
    // side. PlanSpec pins "no live banding node in the final plan".
    val capped0 = capBuckets(banded, Seq("band", "band_hash"), maxBucketSize)
    val capped = if (persistIntermediates) {
      val (df, h) = persistIfNew(capped0, level)
      handles ++= h; df
    } else capped0
    val candidates0 = capped.as("a")
      .join(capped.as("b"), Seq("band", "band_hash"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()

    // Size-adaptive verify join (manual AQE): the candidate-pair
    // cardinality is unknowable at plan time (it depends on how many
    // band buckets collide), so Catalyst plans the verify joins as
    // shuffles of the *shingle-array* frame — the widest rows in the
    // whole pipeline — even when only a handful of pairs survived LSH.
    // AQE would fix this at runtime, but its re-plan works from map
    // output statistics and the persisted InMemoryRelations here hide
    // those. Since the candidate list is a natural materialization
    // point anyway (every production dedup checkpoints it before the
    // expensive verify), count it once and broadcast the pair side
    // when it is small; at real corpus scale (pair counts past
    // broadcastPairCap) this degrades to exactly the shuffle plan we
    // have today.
    val (candidates, bcastPairs) =
      if (persistIntermediates) {
        val (c, h) = persistIfNew(candidates0, level)
        handles ++= h
        (c, c.count() <= broadcastPairCap)
      } else (candidates0, false)

    val pairs = jaccardFromShingles(
        shingled, candidates, broadcastPairs = bcastPairs)
      .filter(col("jaccard") >= minJaccard)
    (pairs, handles.result())
  }

  /** Run `f` over the near-dup pair frame with the operator's cache
    * entries SCOPED to the call: every intermediate
    * [[nearDupMinhash]] persisted (shingles, capped bands, candidate
    * pairs) is unpersisted when `f` returns. Use this whenever the
    * pairs are fully consumed inside `f` (written out, aggregated,
    * fed to clustering) — in a long-lived session the unscoped
    * variant's caches otherwise accumulate until the store thrashes. */
  def withNearDupPairs[T](
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      minJaccard: Double = 0.7,
      maxBucketSize: Int = defaultMaxBucket)(f: DataFrame => T): T = {
    val (pairs, handles) = nearDupMinhashTracked(docs, idCol, textCol,
      shingleK, numHashes, bands, minJaccard, maxBucketSize)
    try f(pairs) finally release(handles)
  }

  /** The near-dup pair list as an eagerly materialized, lineage-
    * truncated frame with ZERO residual session-cache footprint: the
    * LSH + verify job runs now, the result (candidate pairs only —
    * ≪ corpus by construction) lands in a `localCheckpoint` the
    * ContextCleaner frees once the frame becomes unreachable, and
    * every intermediate this call persisted is unpersisted before
    * returning. This is the building block for the cluster-family
    * operators ([[clusterDedup]], [[dupClusterStats]],
    * [[crossSourceDupStats]], leakage-safe splitting): they consume
    * the pairs immediately, so leaving the wide shingle caches in the
    * session store — the round-8 driver-bench pathology, where a
    * 154-query session accumulated them until warm passes ran slower
    * than cold — buys nothing. (localCheckpoint trades lineage for
    * footprint: on executor loss the checkpointed blocks are gone and
    * the job fails rather than recomputes — acceptable for a frame
    * this small; the expensive upstream stays recomputable.) */
  def nearDupPairsMaterialized(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      minJaccard: Double = 0.7,
      maxBucketSize: Int = defaultMaxBucket): DataFrame =
    withNearDupPairs(docs, idCol, textCol, shingleK, numHashes, bands,
      minJaccard, maxBucketSize)(_.localCheckpoint(true))

  /** Max candidate-pair count for the broadcast verify path: 16k pairs
    * keeps the second join's broadcast side (pairs + one shingle array
    * each, ~2 KB/row worst case) near 32 MB — comfortably inside any
    * sane broadcast budget, and far below the pair counts where the
    * shuffle plan is the right one anyway. */
  val broadcastPairCap: Long = 16384L

  // ---- incremental (new batch vs frozen reference) -------------------

  /** Shared internals of the incremental dedup: (exact survivors,
    * near-dropped ids, unpersist handles). The near phase is
    * cross-corpus banded LSH — incoming bands join REFERENCE bands
    * (never a self-join, never doc×doc); each side's buckets are
    * capped independently, bounding a bucket's pair contribution at
    * cap². Callers must release the handles after their terminal
    * action over the returned frames — each public wrapper does, so a
    * long-lived session ends every call with zero residual cache
    * footprint from this operator. */
  private[llm] def incrementalPhases(
      incoming: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int,
      numHashes: Int,
      bands: Int,
      minJaccard: Double,
      maxBucketSize: Int): (DataFrame, DataFrame, Seq[DataFrame]) = {
    graft.functions.GraftFunctions.register(incoming.sparkSession)
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val handles = Seq.newBuilder[DataFrame]
    def tracked(df: DataFrame): DataFrame = {
      val (p, h) = persistIfNew(df, level)
      handles ++= h; p
    }

    // Phase 1 — exact: digest anti-join. Only DISTINCT digests of the
    // reference move (32 B/doc); its text never re-shuffles.
    val refDigests = reference
      .select(contentHash(col(textCol)).as("__graft_digest")).distinct()
    val exactSurvivors = tracked(incoming
      .withColumn("__graft_digest", contentHash(col(textCol)))
      .join(refDigests, Seq("__graft_digest"), "left_anti")
      .drop("__graft_digest"))

    // Phase 2 — near: shingle each side ONCE (persisted, shared by
    // banding and verify — same reuse contract as nearDupMinhash).
    def shingled(df: DataFrame) = df.select(
      col(idCol).as("jid"), shingles(col(textCol), shingleK).as("jsh"))
    val incSh = tracked(shingled(exactSurvivors))
    val refSh = tracked(shingled(reference))
    def bandsOf(sh: DataFrame) = capBuckets(
      sh.select(col("jid").as("id"),
        posexplode(graft.functions.TextExprs.minhash_bands(
          col("jsh"), numHashes, bands)).as(Seq("band", "band_hash"))),
      Seq("band", "band_hash"), maxBucketSize)
    val candidates = bandsOf(incSh)
      .select(col("band"), col("band_hash"), col("id").as("id_a"))
      .join(bandsOf(refSh)
        .select(col("band"), col("band_hash"), col("id").as("id_b")),
        Seq("band", "band_hash"))
      .select("id_a", "id_b").distinct()
    val nearDropped = candidates
      .join(incSh.select(col("jid").as("id_a"), col("jsh").as("sh_a")),
        Seq("id_a"))
      .join(refSh.select(col("jid").as("id_b"), col("jsh").as("sh_b")),
        Seq("id_b"))
      .filter(round(jaccard(col("sh_a"), col("sh_b")), 4) >= minJaccard)
      .select(col("id_a").as(idCol)).distinct()
    (exactSurvivors, nearDropped, handles.result())
  }

  /** Dedup an incoming batch AGAINST a frozen reference corpus — the
    * onboarding pattern at 100 TB: yesterday's corpus is already
    * deduped, so re-deduping it against itself would be wasted work;
    * only the (≪ corpus) incoming batch flows through the pipeline,
    * and the reference contributes nothing but digests and band
    * hashes. Phase 1 drops exact copies (digest anti-join); phase 2
    * drops incoming docs with a verified near-dup in the reference
    * (cross-corpus LSH at [[nearDupMinhash]]'s recall: r=2 × b=32 is
    * ≈1 collision probability at the 0.5 threshold). Returns the
    * surviving incoming rows with their original columns. */
  def incrementalDedup(
      incoming: DataFrame,
      reference: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      minJaccard: Double = 0.5,
      maxBucketSize: Int = defaultMaxBucket): DataFrame = {
    val (survivors, nearDropped, handles) = incrementalPhases(
      incoming, reference, idCol, textCol, shingleK, numHashes, bands,
      minJaccard, maxBucketSize)
    try {
      // the near-dropped id list (≪ incoming) is the one product of
      // the expensive cross-corpus LSH pass — materialize it NOW so
      // the shingle caches can be released; the kept frame below then
      // depends only on this checkpoint plus the (recomputable,
      // cheap) exact phase
      val droppedIds = nearDropped.localCheckpoint(true)
      survivors.join(droppedIds, Seq(idCol), "left_anti")
    } finally release(handles)
  }

  /** [[incrementalDedup]] and its phase audit from ONE pass: the exact
    * anti-join and the cross-corpus LSH run once and feed both the
    * kept output and the audit row (running the two public wrappers
    * separately would execute every phase twice). The audit counts are
    * computed eagerly — they are the terminal action that lets this
    * call unpersist every intermediate before returning. Returns
    * (kept rows, one-row audit). */
  def incrementalDedupWithAudit(
      incoming: DataFrame,
      reference: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      minJaccard: Double = 0.5,
      maxBucketSize: Int = defaultMaxBucket): (DataFrame, DataFrame) = {
    val (survivors, nearDropped, handles) = incrementalPhases(
      incoming, reference, idCol, textCol, shingleK, numHashes, bands,
      minJaccard, maxBucketSize)
    try {
      val droppedIds = nearDropped.localCheckpoint(true)
      val nSurv = survivors.count() // cached by the phases — cheap
      val nDrop = droppedIds.count() // from the checkpoint — cheap
      val nInc = incoming.count()
      val kept = survivors.join(droppedIds, Seq(idCol), "left_anti")
      val audit = incoming.sparkSession.range(1).select(
        lit(nInc).as("n_incoming"),
        lit(nInc - nSurv).as("n_exact_dropped"),
        lit(nDrop).as("n_near_dropped"),
        lit(nSurv - nDrop).as("n_kept"))
      (kept, audit)
    } finally release(handles)
  }

  /** One-row audit of [[incrementalDedup]]: how much of the incoming
    * batch each phase dropped. The onboarding dashboard number — a
    * sudden jump in either column means the crawler re-fetched an
    * already-ingested site. Computed eagerly (see
    * [[incrementalDedupWithAudit]]); callers that also need the kept
    * rows should use that combined form instead of calling both
    * wrappers. */
  def incrementalDedupAudit(
      incoming: DataFrame,
      reference: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      minJaccard: Double = 0.5,
      maxBucketSize: Int = defaultMaxBucket): DataFrame =
    incrementalDedupWithAudit(incoming, reference, idCol, textCol,
      shingleK, numHashes, bands, minJaccard, maxBucketSize)._2

  // ---- persisted LSH index (build once, probe many) -------------------

  /** Current LSH index layout version; bumped when the stored tables
    * change shape so an old index reads as absent and is rebuilt.
    * v3: per-bucket sizes move from a denormalized `bucket_n` column
    * on every bands row to a separate `bucket_counts` table — counts
    * are associative there, which is what makes [[appendToLshIndex]]
    * exact (append ≡ rebuild); the probe's cap becomes a broadcast
    * anti-join against the (tiny by nature) oversized-bucket set
    * instead of a pushed column filter.
    *
    * v4: every table becomes a directory of SEGMENTS
    * ([[graft.maintain.Segments]] — build writes `seg=base`, each
    * append exactly one new segment, overwrite-own-directory): an
    * at-least-once replay of the same append batch (the streaming
    * arm's crash-between-sink-and-checkpoint window) converges to the
    * identical index instead of duplicating digest/band/shingle rows
    * and double-counting buckets. bucket_counts holds PER-SEGMENT
    * counts summed at probe time (integer addition — the same
    * arithmetic the v3 swap-merge precomputed); [[compactLshIndex]]
    * restores the canonical single-segment layout a rebuild
    * produces. */
  val LshIndexFormat: Int = 4

  /** Does a CURRENT-format LSH index exist at `path`? (Checks the
    * meta table's `_SUCCESS` marker — the LAST table
    * [[writeLshIndex]] writes, so a half-built index from a crashed
    * build reads as absent and is rebuilt — then the format version,
    * so a stale layout is rebuilt rather than mis-read.) */
  def lshIndexExists(spark: SparkSession, path: String): Boolean =
    graft.maintain.Segments.metaFormatIs(spark, path, LshIndexFormat)

  /** Materialize the frozen reference corpus's dedup index at `path` —
    * the build-once/probe-many form of [[incrementalDedup]]. The
    * onboarding loop at 100 TB probes the SAME reference with every
    * incoming batch; without an index each probe re-reads, re-tokenizes,
    * re-shingles and re-minhashes the full reference corpus, the single
    * largest cost in the pipeline. This writes that precomputation
    * once (parquet, all mergeable into the next rebuild):
    *
    *   - `path/meta`     — one row (shingle_k, num_hashes, bands):
    *                       probes hash with the STORED parameters, so
    *                       a build/probe mismatch cannot happen
    *   - `path/digests`  — distinct content digests (32 B/doc): the
    *                       exact phase
    *   - `path/bands`    — (id, band, band_hash), uncapped (the probe
    *                       applies its own [[capBuckets]] bound): the
    *                       candidate phase, 20 B/row × bands per doc
    *   - `path/shingles` — (id, sh): the verify phase's reference
    *                       side. The one corpus-sized table, read only
    *                       through a join that keeps candidate ids; a
    *                       production deployment would additionally
    *                       bucket it by id for file pruning
    *                       ([[graft.maintain.Layout]] provides that).
    *
    * The reference is shingled ONCE (persisted) and feeds both the
    * bands and shingles writes. */
  def writeLshIndex(
      reference: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = reference.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // invalidate an OLD index at this path first (meta is the validity
    // marker) so a crash mid-rebuild reads as absent, not as stale
    // meta over half-rebuilt tables
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val mfs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (mfs.exists(metaPath) && !mfs.delete(metaPath, true))
      throw new graft.maintain.Swap.SwapFailedException(
        s"could not clear stale meta at $metaPath")
    // scale-adaptive segment shaping: coalesce (never a shuffle) to
    // the size-derived shard count — the shingles/bands tables are
    // ≈ text-sized, digests/bucket_counts far smaller
    val nShards = graft.maintain.Segments.shardCount(
      reference.select(col(idCol), col(textCol)))
    val nSmall = math.max(1, nShards / 16)
    graft.maintain.Segments.writeBase(
      reference.select(contentHash(col(textCol)).as("digest")).distinct()
        .coalesce(nSmall),
      s"$path/digests")
    val (sh, handle) = persistIfNew(
      reference.select(
        col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bucket sizes are precomputed AT BUILD: every probe needs the
      // bucket-cap filter, and computing them here means a probe never
      // re-tokenizes or re-hashes the reference. The counts live in
      // their own `bucket_counts` table, one count per (segment,
      // bucket) — associative, so appends stay exact — and the probe
      // reads only the OVERSIZED buckets (sum over segments > cap) —
      // tiny by nature (boilerplate families) — as a broadcast
      // anti-join set
      val bandRows = persistIfNew(
        sh.select(col("id"),
          posexplode(graft.functions.TextExprs.minhash_bands(
            col("sh"), numHashes, bands)).as(Seq("band", "band_hash"))),
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        graft.maintain.Segments.writeBase(
          bandRows._1.coalesce(nShards), s"$path/bands")
        graft.maintain.Segments.writeBase(
          bandRows._1.groupBy("band", "band_hash")
            .agg(count(lit(1)).as("n")).coalesce(nSmall),
          s"$path/bucket_counts")
      } finally release(bandRows._2.toSeq)
      graft.maintain.Segments.writeBase(
        sh.coalesce(nShards), s"$path/shingles")
    } finally release(handle.toSeq)
    // meta LAST: its _SUCCESS is the index's validity marker
    spark.range(1).select(
        lit(LshIndexFormat).as("format"),
        lit(shingleK).as("shingle_k"),
        lit(numHashes).as("num_hashes"),
        lit(bands).as("bands"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Incremental index maintenance: fold NEW reference documents
    * (a vetted batch joining the frozen corpus) into the persisted
    * LSH index — the onboarding loop's "accepted docs become
    * tomorrow's reference" step, without a rebuild. Every stored
    * table merges exactly: digests/bands/shingles are per-document
    * rows and bucket sizes are associative per-segment counts (summed
    * at probe time), so the appended index PROBES identically to a
    * rebuild over the grown reference, and [[compactLshIndex]]
    * reduces its layout to the rebuild's (both pinned in DedupSpec).
    * Hashing parameters come from the stored meta, so an append can
    * never diverge from the build.
    *
    * The append writes ONE new segment per table ([[graft.maintain
    * .Segments.writeSegment]], overwrite-own-directory) — IDEMPOTENT
    * per `segId`: the streaming arm's at-least-once replay (crash
    * after the sink work, before the checkpoint commit) re-runs with
    * the same batch-derived segId and converges; a crash MID-append
    * leaves a valid index whose tables are at most one batch apart
    * until that replay. Batch callers without a replay story omit
    * `segId` and get a fresh unique segment.
    *
    * Digests are deduplicated within the batch only: appending a doc
    * whose text already exists in the stored reference leaves one
    * duplicate digest row across segments. Probe semantics are
    * unchanged (the exact phase is an anti-join — membership, not
    * counts) and [[compactLshIndex]] restores global distinctness;
    * both are pinned in DedupSpec. */
  def appendToLshIndex(
      newReference: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      segId: String = graft.maintain.Segments.freshSegId()): Unit = {
    val spark = newReference.sparkSession
    graft.functions.GraftFunctions.register(spark)
    require(lshIndexExists(spark, path),
      s"no LSH index at $path — writeLshIndex first")
    val meta = graft.maintain.Segments.metaRow(spark, path).get
    val shingleK = meta.getAs[Int]("shingle_k")
    val numHashes = meta.getAs[Int]("num_hashes")
    val bands = meta.getAs[Int]("bands")
    val nShards = graft.maintain.Segments.shardCount(
      newReference.select(col(idCol), col(textCol)))
    val nSmall = math.max(1, nShards / 16)
    graft.maintain.Segments.writeSegment(
      newReference
        .select(contentHash(col(textCol)).as("digest")).distinct()
        .coalesce(nSmall),
      s"$path/digests", segId)
    val (sh, handle) = persistIfNew(
      newReference.select(
        col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bandRows = persistIfNew(
        sh.select(col("id"),
          posexplode(graft.functions.TextExprs.minhash_bands(
            col("sh"), numHashes, bands)).as(Seq("band", "band_hash"))),
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        graft.maintain.Segments.writeSegment(
          bandRows._1.coalesce(nShards), s"$path/bands", segId)
        graft.maintain.Segments.writeSegment(
          bandRows._1.groupBy("band", "band_hash")
            .agg(count(lit(1)).as("n")).coalesce(nSmall),
          s"$path/bucket_counts", segId)
      } finally release(bandRows._2.toSeq)
      graft.maintain.Segments.writeSegment(
        sh.coalesce(nShards), s"$path/shingles", segId)
    } finally release(handle.toSeq)
  }

  /** Compact an appended index back to the canonical single-segment
    * layout a fresh [[writeLshIndex]] over the grown reference
    * produces: digests globally DISTINCT again (an appended re-digest
    * of an already-indexed text leaves a cross-segment duplicate row —
    * see [[appendToLshIndex]]), bucket counts summed to their merged
    * form, bands/shingles consolidated. Each table replaces under the
    * crash-safe [[graft.maintain.Swap]] protocol — a concurrent probe
    * sees the old table or the new one, never halves — and probe
    * results are unchanged by construction (pinned in DedupSpec
    * against a rebuild). */
  def compactLshIndex(spark: SparkSession, path: String): Unit = {
    require(lshIndexExists(spark, path),
      s"no LSH index at $path — writeLshIndex first")
    def shaped(t: DataFrame): DataFrame =
      t.coalesce(graft.maintain.Segments.shardCount(t))
    graft.maintain.Segments.replaceTable(spark, s"$path/digests")(t =>
      shaped(t.distinct()))
    graft.maintain.Segments.replaceTable(spark, s"$path/bands")(shaped)
    graft.maintain.Segments.replaceTable(spark, s"$path/bucket_counts")(t =>
      shaped(t.groupBy("band", "band_hash").agg(sum(col("n")).as("n"))))
    graft.maintain.Segments.replaceTable(spark, s"$path/shingles")(shaped)
  }

  /** [[incrementalDedup]] against a PERSISTED index instead of the
    * live reference frame: same two phases, same thresholds, same
    * output — `(kept rows, one-row audit)` like
    * [[incrementalDedupWithAudit]] — but the reference corpus
    * contributes only its stored digests, band hashes and (for
    * verified candidates) shingle arrays. Hashing parameters come
    * from the index's meta table, so the probe is always consistent
    * with the build. */
  def incrementalDedupIndexedWithAudit(
      incoming: DataFrame,
      indexPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      minJaccard: Double = 0.5,
      maxBucketSize: Int = defaultMaxBucket): (DataFrame, DataFrame) = {
    val spark = incoming.sparkSession
    graft.functions.GraftFunctions.register(spark)
    require(lshIndexExists(spark, indexPath),
      s"no LSH index at $indexPath — writeLshIndex first")
    val meta = graft.maintain.Segments.metaRow(spark, indexPath).get
    val shingleK = meta.getAs[Int]("shingle_k")
    val numHashes = meta.getAs[Int]("num_hashes")
    val bands = meta.getAs[Int]("bands")

    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val handles = Seq.newBuilder[DataFrame]
    def tracked(df: DataFrame): DataFrame = {
      val (p, h) = persistIfNew(df, level)
      handles ++= h; p
    }
    try {
      // phase 1 — exact, against the stored digest set
      val refDigests = spark.read.parquet(s"$indexPath/digests")
        .withColumnRenamed("digest", "__graft_digest")
      val exactSurvivors = tracked(incoming
        .withColumn("__graft_digest", contentHash(col(textCol)))
        .join(refDigests, Seq("__graft_digest"), "left_anti")
        .drop("__graft_digest"))
      // phase 2 — near: incoming bands vs STORED bands (both sides
      // bucket-capped, exactly like the live incrementalPhases)
      val incSh = tracked(exactSurvivors.select(
        col(idCol).as("jid"), shingles(col(textCol), shingleK).as("jsh")))
      val incBands = capBuckets(
        incSh.select(col("jid").as("id"),
          posexplode(graft.functions.TextExprs.minhash_bands(
            col("jsh"), numHashes, bands)).as(Seq("band", "band_hash"))),
        Seq("band", "band_hash"), maxBucketSize)
      // ref-side bucket cap: the build-time bucket_counts table —
      // per-segment counts summed to global bucket sizes (one
      // map-side-combined aggregate over a table of bucket keys, a
      // sliver of the bands table the probe joins anyway; a compacted
      // index has one segment and the combine is a pass-through) —
      // filtered to the OVERSIZED buckets (tiny by nature — they are
      // the boilerplate families the cap exists to excise), excluded
      // from the stored bands by broadcast anti-join. The probe never
      // re-tokenizes, re-hashes or re-counts the reference corpus
      val oversized = spark.read.parquet(s"$indexPath/bucket_counts")
        .groupBy("band", "band_hash").agg(sum(col("n")).as("n"))
        .filter(col("n") > maxBucketSize)
        .select("band", "band_hash")
      val refBands = spark.read.parquet(s"$indexPath/bands")
        .join(broadcast(oversized), Seq("band", "band_hash"), "left_anti")
      // candidates are a natural materialization point (the live path
      // counts them too, for its broadcast-verify choice); here the
      // count additionally gates the index's verify READ: when the
      // candidate set is small — the common mostly-fresh batch — the
      // ref shingle ids go INTO the shingles scan as a pushed filter,
      // so the verify reads the candidate rows' row groups instead of
      // scanning and shuffling the corpus-sized shingles table (the
      // whole point of probing an index). Past the cap it degrades to
      // the full-scan join, which is then proportionate to a genuinely
      // dup-heavy batch.
      val candidates = incBands
        .select(col("band"), col("band_hash"), col("id").as("id_a"))
        .join(refBands
          .select(col("band"), col("band_hash"), col("id").as("id_b")),
          Seq("band", "band_hash"))
        .select("id_a", "id_b").distinct()
        .localCheckpoint(true)
      val refSh0 = spark.read.parquet(s"$indexPath/shingles")
      // gate the verify-read pushdown on the DISTINCT candidate id
      // count, collected with a cap+1 limit — one job decides AND
      // yields the filter list (the former pair-count gate spent a
      // separate count() job to bound the same isin list, and a
      // many-pairs/few-ids batch wrongly fell off the pushed path)
      val refSh = {
        val ids = candidates.select("id_b").distinct()
          .limit(broadcastPairCap.toInt + 1)
          .collect().map(_.get(0)).toSeq
        if (ids.isEmpty) refSh0.filter(lit(false))
        else if (ids.length <= broadcastPairCap)
          refSh0.filter(col("id").isin(ids: _*))
        else refSh0
      }
      val nearDropped = candidates
        .join(incSh.select(col("jid").as("id_a"), col("jsh").as("sh_a")),
          Seq("id_a"))
        .join(refSh.select(col("id").as("id_b"), col("sh").as("sh_b")),
          Seq("id_b"))
        .filter(round(jaccard(col("sh_a"), col("sh_b")), 4) >= minJaccard)
        .select(col("id_a").as(idCol)).distinct()
        .localCheckpoint(true)
      val nSurv = exactSurvivors.count()
      val nDrop = nearDropped.count()
      val nInc = incoming.count()
      val kept = exactSurvivors.join(nearDropped, Seq(idCol), "left_anti")
      val audit = spark.range(1).select(
        lit(nInc).as("n_incoming"),
        lit(nInc - nSurv).as("n_exact_dropped"),
        lit(nDrop).as("n_near_dropped"),
        lit(nSurv - nDrop).as("n_kept"))
      (kept, audit)
    } finally release(handles.result())
  }

  /** Kept rows only, from the persisted index. */
  def incrementalDedupIndexed(
      incoming: DataFrame,
      indexPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      minJaccard: Double = 0.5,
      maxBucketSize: Int = defaultMaxBucket): DataFrame =
    incrementalDedupIndexedWithAudit(
      incoming, indexPath, idCol, textCol, minJaccard, maxBucketSize)._1

  // ---- SimHash ------------------------------------------------------

  /** Per-doc 64-bit SimHash signature (custom codegen expression). */
  def simhashes(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(
      col(idCol).as("id"),
      simhash64(split(lower(trim(col(textCol))), "\\s+")).as("simhash"))
  }

  /** Near-dup pairs by SimHash: bucket on each of four 16-bit sub-bands
    * (a pair within Hamming distance ≤ 3 of 64 bits must agree exactly
    * on at least one 16-bit band — pigeonhole), verify with bit_count
    * of XOR. Same explode→bucket-join→verify shape as MinHash LSH. */
  def nearDupSimhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      maxBucketSize: Int = defaultMaxBucket): DataFrame = {
    val sig = simhashes(docs, idCol, textCol)
    val bandVals = array((0 until 4).map(b =>
      shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val banded = capBuckets(
      sig.select(
        col("id"), col("simhash"),
        posexplode(bandVals).as(Seq("band", "band_val"))),
      Seq("band", "band_val"), maxBucketSize)

    val a = banded.select(col("band"), col("band_val"),
      col("id").as("id_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("band_val"),
      col("id").as("id_b"), col("simhash").as("sim_b"))

    a.join(b, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("int")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- benchmark contamination --------------------------------------

  /** Flag training documents that share at least one k-word shingle
    * with a benchmark/eval document — the train/test contamination
    * check every pretraining pipeline must run before the corpus
    * ships. Returns (doc_id, n_bench_hits = distinct benchmark docs
    * overlapped).
    *
    * Scale shape: eval sets are tiny (KBs–MBs) next to a 100 TB
    * corpus, so the benchmark shingles explode + BROADCAST; the probe
    * side explodes narrowly (no shuffle before the final doc_id agg
    * with map-side partial counts). Never an all-pairs doc×doc join —
    * the join key is the shingle itself. */
  def contaminationHits(
      probe: DataFrame,
      bench: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(probe.sparkSession)
    def exploded(df: DataFrame, as: String) = df.select(
      col(idCol).as(as),
      explode(shingles(col(textCol), k)).as("sh"))
    exploded(probe, idCol)
      .join(broadcast(exploded(bench, "bench_id").distinct()), Seq("sh"))
      .groupBy(idCol)
      .agg(countDistinct(col("bench_id")).as("n_bench_hits"))
  }

  /** Act on the contamination check: drop every training document that
    * shares at least one k-word shingle with the benchmark — the
    * detect→remove closure of [[contaminationHits]] (detection without
    * removal leaves the eval leak in the corpus). Same scale shape:
    * bench shingles broadcast, probe side explodes narrowly, and the
    * final anti-join is keyed on the (≪ corpus) contaminated-id set.
    * Returns the surviving training rows with original columns. */
  def decontaminate(
      probe: DataFrame,
      bench: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    probe.join(
      contaminationHits(probe, bench, k, idCol, textCol)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Contamination check with a Bloom pre-prune on the probe shingles:
    * the bench shingle set is collapsed to a bit-set sketch
    * (~10 bits/shingle vs ~50+ bytes/shingle for a broadcast hashed
    * relation) and probe shingles that cannot be in the bench are
    * dropped inside the scan's codegen stage, BEFORE the join. No
    * false negatives → row-identical to `contaminationHits` (same
    * oracle); false positives only add verify rows to the exact join.
    * This is the shape that survives an eval suite too large to
    * broadcast: at 100 TB the join input shrinks from |all probe
    * shingles| to |matching ∪ fpp-sampled| — in the common
    * mostly-clean corpus, orders of magnitude. */
  def contaminationHitsBloom(
      probe: DataFrame,
      bench: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text",
      expectedShingles: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    graft.functions.GraftFunctions.register(probe.sparkSession)
    import graft.functions.BloomExprs
    val benchSh = bench.select(
      col(idCol).as("bench_id"),
      explode(shingles(col(textCol), k)).as("sh")).distinct()
    val m = BloomExprs.optimalNumBits(expectedShingles, fpp)
    val kk = BloomExprs.optimalK(m, expectedShingles)
    val sketch = benchSh
      .agg(BloomExprs.bloom_agg(xxhash64(col("sh")), m, kk).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    probe.select(
        col(idCol),
        explode(shingles(col(textCol), k)).as("sh"))
      .filter(BloomExprs.bloom_might_contain(
        lit(sketch), xxhash64(col("sh")), kk))
      .join(broadcast(benchSh), Seq("sh"))
      .groupBy(idCol)
      .agg(countDistinct(col("bench_id")).as("n_bench_hits"))
  }

  // ---- n-gram Jaccard (exact, for candidate pairs) ------------------

  /** Exact n-gram Jaccard for an explicit candidate pair set
    * (pairs: id_a, id_b). Joins shingle sets back — two broadcast-or-
    * shuffle hash joins on ids, then per-row set math. */
  def ngramJaccardPairs(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    jaccardFromShingles(
      docs.select(col(idCol).as("jid"), shingles(col(textCol), k).as("jsh")),
      pairs)
  }

  /** Verify step over a pre-shingled (jid, jsh) frame — lets callers
    * that already computed shingles (nearDupMinhash's banding) reuse
    * them instead of re-shingling the corpus. */
  private[llm] def jaccardFromShingles(
      shingled: DataFrame,
      pairs: DataFrame,
      broadcastPairs: Boolean = false): DataFrame = {
    // With broadcastPairs the pair-derived side is the build side of
    // BOTH joins (the first join's output is pairs + one shingle array
    // each — still broadcast-sized under broadcastPairCap), so the
    // shingle frame streams in place and its arrays never shuffle.
    val p = if (broadcastPairs) broadcast(pairs) else pairs
    val withA = p
      .join(shingled.withColumnRenamed("jid", "id_a")
        .withColumnRenamed("jsh", "sh_a"), Seq("id_a"))
    val withAB = (if (broadcastPairs) broadcast(withA) else withA)
      .join(shingled.withColumnRenamed("jid", "id_b")
        .withColumnRenamed("jsh", "sh_b"), Seq("id_b"))
    withAB.select(col("id_a"), col("id_b"),
      round(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
  }

  /** Cross-source near-dup provenance: for every unordered source
    * pair, how many near-dup document pairs straddle it and at what
    * mean similarity — the audit a mixture builder runs to find
    * sources that are largely re-crawls of each other (within-source
    * duplication shows up on the diagonal `source_x = source_y`).
    *
    * Scale: the pair list comes from the capped LSH pass
    * ([[nearDupMinhash]] — no all-pairs stage); joining sources back
    * is two id-keyed joins where the pair side is candidates only
    * (≪ corpus), then a group-by over ≤ |sources|² rows. */
  def crossSourceDupStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source",
      minJaccard: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 32): DataFrame = {
    val pairs = nearDupPairsMaterialized(docs, idCol = idCol,
      textCol = textCol, numHashes = numHashes, bands = bands,
      minJaccard = minJaccard)
    val src = docs.select(col(idCol), col(sourceCol))
    pairs
      .join(src.select(col(idCol).as("id_a"), col(sourceCol).as("src_a")),
        Seq("id_a"))
      .join(src.select(col(idCol).as("id_b"), col(sourceCol).as("src_b")),
        Seq("id_b"))
      .select(
        least(col("src_a"), col("src_b")).as("source_x"),
        greatest(col("src_a"), col("src_b")).as("source_y"),
        col("jaccard"))
      .groupBy("source_x", "source_y")
      .agg(
        count(lit(1)).as("n_pairs"),
        round(avg(col("jaccard")), 4).as("avg_jaccard"),
        // Engine-stable twin of avg_jaccard for oracle comparison:
        // AVG's divide-by-count can land a 2-pair group's mean exactly
        // on a ROUND(x,4) half-way (observed at sf0.1: 4 of 148 groups
        // flipped their last display digit between engines because the
        // two AVGs produced doubles on opposite sides of .xxxx5). The
        // sum of per-pair QUANTIZED jaccards scaled to integer has no
        // such boundary: each addend is ~k/10⁴ with ~1e-16 error, so
        // the scaled sum sits ~1e-12 from an integer, and exact
        // rational halves (e.g. 21/32 at the per-pair round) go
        // HALF_UP in both engines. Same precedent as the semDedup
        // marks-only hash (COVERAGE 5f): decision/integer surfaces in
        // the gate, floats in the API.
        round(sum(round(col("jaccard"), 4)) * 10000).cast("long")
          .as("jaccard_sum_e4"))
  }

  /** Result of [[connectedComponentsWithStats]]: the (id, cluster)
    * labels plus whether the min-label loop reached its fixpoint and
    * how many propagation rounds it ran. `converged == false` means
    * some component's diameter exceeded `maxIters` and its labels are
    * TRUNCATED — one long chain shows up as several clusters. */
  final case class ComponentsResult(
      labels: DataFrame, converged: Boolean, iterations: Int)

  /** Connected components over a near-dup pair list — the cluster-
    * formation step a real dedup pipeline needs between pair finding
    * and keep-one-per-CLUSTER (pairwise keep-one over-deletes when
    * A~B and B~C but A≁C: A,B,C are one duplicate group).
    *
    * Iterative min-label propagation, the standard large-graph shape
    * (GraphX/GraphFrames use the same algorithm): every node starts
    * as its own label; each round, nodes adopt the minimum label among
    * themselves and their neighbors; fixpoint in O(component diameter)
    * rounds — for near-dup graphs, small (most components are
    * cliques-ish of a few documents). Each round is one join + one
    * min-aggregate, both keyed shuffles; each round's labels are
    * `localCheckpoint`ed — materialized AND lineage-truncated, so the
    * analyzed plan is O(1) per round. (`persist` alone would keep the
    * full logical lineage and analyzer cost would grow with the
    * iteration count.)
    *
    * Logs a warning and returns the truncated labels if the loop exits
    * without converging (diameter > `maxIters`); callers that need to
    * act on that signal should use [[connectedComponentsWithStats]].
    *
    * Returns (id, cluster): every node that appears in `pairs`, with
    * its component's minimum id as the cluster label. An empty `pairs`
    * frame (a corpus with zero near-dup pairs — valid, common input)
    * yields an empty result, not an error. */
  def connectedComponents(
      pairs: DataFrame,
      maxIters: Int = 50,
      collectThreshold: Long = DefaultCcCollectThreshold): DataFrame = {
    val res = connectedComponentsWithStats(pairs, maxIters, collectThreshold)
    if (!res.converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents did not converge in ${res.iterations} " +
          "rounds; some component's diameter exceeds maxIters and its " +
          "labels are truncated (one chain may appear as several clusters)")
    res.labels
  }

  /** Directed-edge count under which [[connectedComponentsWithStats]]
    * collects the edge list and runs union-find on the driver instead
    * of iterating distributed propagation rounds. 2^20 directed edges
    * = 2^19 near-dup pairs; worst-case driver footprint is ~2^21 boxed
    * endpoints in a parent map plus the collected rows — low hundreds
    * of MB, bounded by construction. Near-dup graphs after LSH+verify
    * are almost always far below this (duplicates are a small fraction
    * of the corpus and components are few-doc cliques), so in practice
    * the fast path serves everything up to corpora several orders of
    * magnitude beyond the test SFs, and a 100 TB corpus whose pair
    * graph exceeds it gets the distributed loop unchanged. */
  val DefaultCcCollectThreshold: Long = 1L << 20

  /** External-value ordering matching Spark's `min` for the id types
    * the driver union-find supports; `None` → keep the edge list
    * distributed (exotic id types still work, just without the small-
    * graph fast path). */
  private def driverIdOrdering(
      dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType    => Some(Ordering.by[Any, Long](_.asInstanceOf[Long]))
      case IntegerType => Some(Ordering.by[Any, Int](_.asInstanceOf[Int]))
      case ShortType   => Some(Ordering.by[Any, Short](_.asInstanceOf[Short]))
      case StringType  =>
        Some(Ordering.by[Any, String](_.asInstanceOf[String]))
      case _ => None
    }
  }

  /** [[connectedComponents]] with the convergence signal exposed.
    *
    * Size-adaptive (the AQE philosophy — pick the physical strategy
    * from the measured size, not the worst case): the symmetric edge
    * frame is counted once and, when it fits `collectThreshold` and
    * the id type is orderable on the driver, the whole component
    * computation is one collect + driver union-find + local-relation
    * result (`iterations == 0`, always converged) instead of
    * O(diameter) join+aggregate shuffle rounds. The local-relation
    * labels also make the caller's labels⋈corpus join broadcast-able
    * for free. Pass `collectThreshold = 0` to force the distributed
    * loop (probes/tests pin its round semantics that way). */
  def connectedComponentsWithStats(
      pairs: DataFrame,
      maxIters: Int = 50,
      collectThreshold: Long = DefaultCcCollectThreshold): ComponentsResult = {
    import org.apache.spark.storage.StorageLevel
    // null-id edges are dropped EXPLICITLY so both strategies agree:
    // the propagation join is null-rejecting anyway, but the driver
    // union-find's hash map would happily carry a null node and the
    // two paths would silently diverge on corrupt input.
    val nonNullPairs =
      pairs.filter(col("id_a").isNotNull && col("id_b").isNotNull)
    val edges = nonNullPairs
      .select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(
        nonNullPairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val idType = edges.schema("u").dataType
    val ordOpt =
      if (collectThreshold > 0) driverIdOrdering(idType) else None
    if (ordOpt.isDefined && edges.count() <= collectThreshold) {
      val labels = driverUnionFind(edges, idType, ordOpt.get)
      edges.unpersist()
      return ComponentsResult(labels, converged = true, iterations = 0)
    }
    // lazy localCheckpoint: materialized by labelSum's action below,
    // after which the plan is a single LogicalRDD leaf — constant
    // depth regardless of how many rounds follow.
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(false)
    // convergence via the label-sum invariant: a round can only LOWER
    // labels (min over self+neighbors), so the sum over all nodes
    // strictly decreases until fixpoint — one aggregate action per
    // round instead of a change-detection join. decimal(38,0) keeps
    // the sum exact at any id scale; coalesce to 0 because sum over an
    // empty frame is null (zero near-dup pairs must not NPE).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("cluster").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val next = edges
        .join(labels.withColumnRenamed("id", "u"), Seq("u"))
        .select(col("v").as("id"), col("cluster"))
        .unionByName(labels)
        .groupBy("id")
        .agg(min("cluster").as("cluster"))
        .localCheckpoint(false)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    ComponentsResult(labels, converged, iter)
  }

  /** Driver-side union-find over a collected symmetric edge list,
    * bounded by [[DefaultCcCollectThreshold]] at the call site. Roots
    * are kept at the component MINIMUM id (union attaches the larger
    * root under the smaller), so `find(node)` IS the cluster label —
    * identical to the distributed min-label fixpoint. Path compression
    * keeps the total near-linear in edges. Returns a local relation
    * `(id, cluster)` over every node in the edge list. */
  private def driverUnionFind(
      edges: DataFrame,
      idType: org.apache.spark.sql.types.DataType,
      ord: Ordering[Any]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    import scala.jdk.CollectionConverters._
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      var p = parent.getOrDefault(r, r)
      while (p != r) { r = p; p = parent.getOrDefault(r, r) }
      var c = x // second pass: compress the walked path onto the root
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    // one collect, not toLocalIterator: the latter schedules a job per
    // partition (the per-job overhead this path exists to avoid), and
    // the call-site threshold already bounds the collected size.
    edges.collect().foreach { row =>
      val (ra, rb) = (find(row.get(0)), find(row.get(1)))
      if (ra != rb) {
        if (ord.lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
      }
      parent.putIfAbsent(row.get(0), row.get(0))
      parent.putIfAbsent(row.get(1), row.get(1))
    }
    val out = parent.keySet().asScala.toSeq
      .map(id => Row(id, find(id))).asJava
    edges.sparkSession.createDataFrame(out,
      StructType(Seq(
        StructField("id", idType, nullable = false),
        StructField("cluster", idType, nullable = false))))
  }

  /** The deduplicated corpus under CLUSTER semantics: one keeper (the
    * minimum id) per connected component of the near-dup graph, plus
    * every document in no component. This is the output a training
    * pipeline actually consumes; `dupClusterStats` is its audit. */
  def clusterDedup(
      docs: DataFrame,
      minJaccard: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val pairs = nearDupPairsMaterialized(docs, minJaccard = minJaccard,
      numHashes = 64, bands = 32, idCol = idCol, textCol = textCol)
    val labels = connectedComponents(pairs)
    // the drop list is bounded by the clustered-doc count (≪ corpus)
    // and comes out of an iterative computation Catalyst has no size
    // stats for — without the hint it plans a sort-merge shuffle of
    // the full corpus against a tiny id set
    val drop = broadcast(labels.filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol)))
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Cluster summary for a corpus: minhash-LSH pairs at `minJaccard`
    * → components → (n_docs, n_clusters, n_clustered_docs,
    * max_cluster). Same recall argument as `nearDupMinhash` (r=2×b=32
    * ⇒ every qualifying pair is a candidate on non-adversarial
    * corpora), so the components equal those over the EXACT pair
    * graph — which is what the DuckDB oracle recomputes. */
  def dupClusterStats(
      docs: DataFrame,
      minJaccard: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val pairs = nearDupPairsMaterialized(docs, minJaccard = minJaccard,
      numHashes = 64, bands = 32, idCol = idCol, textCol = textCol)
    val labels = connectedComponents(pairs)
    val cl = labels.groupBy("cluster").agg(count(lit(1)).as("sz"))
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(cl.agg(
        count(lit(1)).as("n_clusters"),
        coalesce(sum(col("sz")), lit(0L)).as("n_clustered_docs"),
        coalesce(max(col("sz")), lit(0L)).as("max_cluster"))))
  }

  /** Source-level similarity matrix from MERGEABLE MinHash
    * signatures: one `numHashes`-component signature per source
    * (component i = min over the source's distinct shingles of
    * `xxhash64(shingle, i)`), pairwise similarity estimated as the
    * fraction of matching components — the corpus-provenance audit
    * ("how much does crawl A overlap crawl B?") at a cost that never
    * touches pairs of documents.
    *
    * Scale: `min` is associative/commutative, so the signature is ONE
    * map-side-combined aggregate over the exploded (source, shingle)
    * frame and can be maintained incrementally (new batch → min-merge
    * into the stored signature; this is why MinHash, not exact sets).
    * The pairwise comparison runs on |sources|² signature ROWS — at
    * web scale (10⁶ domains) that is a self-join of a 10⁶-row,
    * numHashes-column table, independent of corpus size.
    *
    * Verification contract (the `a7x_approx_distinct` pattern): the
    * hash family is engine-internal, so the gate row emits the EXACT
    * per-pair Jaccard (recomputed from shingle sets — affordable at
    * gate scale only) plus `est_within_tol = |estimate − exact| ≤
    * tolerance`. The estimate is deterministic for a fixed corpus
    * (min over a fixed hash family — no RNG, no order dependence), so
    * the boolean is a deterministic decision surface the oracle pins
    * by recomputing the exact side and asserting TRUE. Default
    * tolerance 0.15 ≈ 3.4σ of the estimator's worst-case standard
    * error at numHashes = 128. */
  def sourceSimilarity(
      docs: DataFrame,
      numHashes: Int = 128,
      tolerance: Double = 0.15,
      shingleK: Int = 3,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(numHashes >= 16 && numHashes <= 512,
      s"numHashes out of range: $numHashes")
    require(tolerance > 0 && tolerance <= 1, s"bad tolerance: $tolerance")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sh0 = docs
      .select(col(sourceCol).as("src"),
        explode(shingles(col(textCol), shingleK)).as("sh"))
      .distinct()
    val (sh, _) = persistIfNew(sh0,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val minCols = (0 until numHashes)
      .map(i => min(xxhash64(col("sh"), lit(i))).as(s"__m$i"))
    val sig = sh.groupBy("src")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("src"),
        array((0 until numHashes).map(i => col(s"__m$i")): _*).as("sig"))
    val sizes = sh.groupBy("src").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("x")
      .join(sh.as("y"), col("x.sh") === col("y.sh")
        && col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("source_x"), col("y.src").as("source_y"))
      .agg(count(lit(1)).as("inter"))
    // explicit broadcast: the signature frame is |sources| rows by
    // construction, but it comes out of an aggregate Catalyst has no
    // stats for — unhinted, the <-condition join would plan a
    // CartesianProduct (PlanLint Error) instead of a bounded BNLJ
    sig.as("a")
      .join(broadcast(sig.as("b")), col("a.src") < col("b.src"))
      .select(
        col("a.src").as("source_x"), col("b.src").as("source_y"),
        (aggregate(
          zip_with(col("a.sig"), col("b.sig"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), _ + _).cast("double") / numHashes).as("est"))
      .join(sizes.select(col("src").as("source_x"),
        col("n_sh").as("n_x")), Seq("source_x"))
      .join(sizes.select(col("src").as("source_y"),
        col("n_sh").as("n_y")), Seq("source_y"))
      .join(inter, Seq("source_x", "source_y"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .select(
        col("source_x"), col("source_y"), col("n_x"), col("n_y"),
        round(col("inter").cast("double") /
          (col("n_x") + col("n_y") - col("inter")), 4).as("j_exact"),
        (abs(col("est") - col("inter").cast("double") /
          (col("n_x") + col("n_y") - col("inter"))) <= tolerance)
          .as("est_within_tol"))
      .orderBy("source_x", "source_y")
  }

  /** Directed containment detection: pairs `(id_a, id_b)` where
    * `containment(a in b) = |S(a) ∩ S(b)| / |S(a)| ≥ minContainment`
    * over k-word shingle sets — the ASYMMETRIC near-dup Jaccard-based
    * LSH structurally misses: a short document quoted whole inside a
    * long one has Jaccard ≈ |S(a)|/|S(b)| (arbitrarily small, so no
    * MinHash band ever collides) but containment 1. This is the
    * quotation / partial-copy / page-wrapped-in-navigation detector a
    * web-scale pipeline runs next to the symmetric one.
    *
    * Plan (no all-pairs stage anywhere):
    *  1. one exploded `(id, shingle)` frame (shingle sets are distinct
    *     per doc by construction);
    *  2. document frequency per shingle as a window over the SAME key
    *     the join below shuffles on (no extra exchange), dropping
    *     shingles with `df > maxShingleDf` — the boilerplate guard: a
    *     shingle present in thousands of documents contributes df²
    *     join rows and signals template text, not quotation (the same
    *     quadratic-degeneracy reasoning as [[capBuckets]]); the drop
    *     is part of the operator's SEMANTICS (containment over the
    *     informative shingle space) and the oracle applies the
    *     identical rule;
    *  3. shingle-keyed equi-join — each shingle contributes ≤ df²
    *     ≤ maxShingleDf² pair rows, so the worst case is bounded per
    *     key and skew-free under AQE;
    *  4. per-pair shared counts vs the contained side's kept-shingle
    *     count. Documents with fewer than `minShingles` kept shingles
    *     are excluded as the contained side (a 1-shingle doc is
    *     trivially "contained" everywhere its one phrase appears).
    *
    * The exploded frame feeds the df window, both join sides, and the
    * per-doc sizes, so it is session-cached once ([[persistIfNew]] —
    * same reuse contract as [[nearDupMinhash]]'s shingle frame).
    *
    * Determinism: `containment` is a single IEEE division of two
    * exact integers, rounded to 4 for display — bit-identical on any
    * engine, no summation-order exposure. */
  def containmentPairs(
      docs: DataFrame,
      minContainment: Double = 0.8,
      shingleK: Int = 3,
      maxShingleDf: Int = 1000,
      minShingles: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"minContainment must be in (0,1]: $minContainment")
    require(maxShingleDf >= 1 && minShingles >= 1,
      s"caps must be >= 1: df=$maxShingleDf, min=$minShingles")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("sh")
    val kept0 = docs
      .select(col(idCol).as("id"),
        explode(shingles(col(textCol), shingleK)).as("sh"))
      .withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") <= maxShingleDf)
      .drop("__df")
    val (kept, _) = persistIfNew(kept0,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = kept.groupBy("id").agg(count(lit(1)).as("n_a"))
    val pairs = kept.as("x")
      .join(kept.as("y"), col("x.sh") === col("y.sh")
        && col("x.id") =!= col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a"), Seq("id_a"))
      .filter(col("n_a") >= minShingles)
      .withColumn("containment",
        round(col("shared").cast("double") / col("n_a"), 4))
      .filter(col("containment") >= minContainment)
      .select("id_a", "id_b", "shared", "n_a", "containment")
  }

  /** The act step of [[containmentPairs]]: drop every document
    * contained (at `minContainment`) in a LARGER document — ties on
    * equal sizes break by keeping the lower id, so mutual 100%
    * containment (an exact duplicate pair) removes exactly one side
    * and a containment CHAIN (a ⊂ b ⊂ c) keeps only the largest. The
    * drop list is bounded by the pair count (≪ corpus), so the final
    * anti-join broadcasts. */
  def containmentDedup(
      docs: DataFrame,
      minContainment: Double = 0.8,
      shingleK: Int = 3,
      maxShingleDf: Int = 1000,
      minShingles: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val pairs = containmentPairs(docs, minContainment, shingleK,
      maxShingleDf, minShingles, idCol, textCol)
    val sized = docs.select(col(idCol).as("id"),
      length(coalesce(col(textCol), lit(""))).as("len"))
    val drop = pairs
      .join(sized.select(col("id").as("id_a"), col("len").as("len_a")), Seq("id_a"))
      .join(sized.select(col("id").as("id_b"), col("len").as("len_b")), Seq("id_b"))
      .filter(col("len_a") < col("len_b")
        || (col("len_a") === col("len_b") && col("id_a") > col("id_b")))
      .select(col("id_a").as(idCol)).distinct()
    docs.join(broadcast(drop), Seq(idCol), "left_anti")
  }
}
