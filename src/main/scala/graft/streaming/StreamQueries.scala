package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q

/** Event-time windowed aggregations (SURVEY §2.9 extension — the
  * reference simulates increments batch-wise and has no event-time
  * logic; the `events` fixture adds the streaming-native surface).
  *
  * The SAME transformation runs in batch (here, oracle-checked) and on
  * a `readStream` source (Incremental.windowedStream + StreamingSpec):
  * Structured Streaming's contract is exactly that parity, so the
  * batch oracle validates the streaming logic too. Window starts are
  * emitted as formatted strings — precision-stable across parquet
  * ns/us timestamp encodings.
  */
object StreamQueries {

  /** Tumbling 1-hour counts per event type, shared batch/stream. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"),
        col("cnt"))

  val st1 = Q(
    "st_tumbling_hourly",
    (s, d) => hourlyCounts(Tables.events(s, d)).orderBy("hour_start", "event_type"),
    Some("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_start,
                   event_type, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""))

  /** Sliding 1-hour windows every 30 minutes: each event lands in
    * exactly two windows (the 30-min grid and grid − 30 min). */
  val st2 = Q(
    "st_sliding_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("cnt"))
        .orderBy("win_start"),
    Some("""SELECT CAST(ws AS VARCHAR) AS win_start, COUNT(*) AS cnt
            FROM (
              SELECT unnest([grid, grid - INTERVAL 30 MINUTE]) AS ws
              FROM (SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800000000
                     AS BIGINT)) AS grid FROM events))
            GROUP BY ws ORDER BY win_start"""))

  /** Windowed aggregate with a dimension rollup: per-hour per-type sum
    * of values (the shape a streaming sink materializes downstream). */
  val st3 = Q(
    "st_windowed_sum",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
        .agg(round(sum(col("value")), 2).as("total_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"),
          col("total_value"))
        .orderBy("win_start", "event_type"),
    Some("""SELECT CAST(make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600000000
                     AS BIGINT)) AS VARCHAR) AS win_start,
                   event_type, ROUND(SUM(value), 2) AS total_value
            FROM events GROUP BY 1, 2 ORDER BY win_start, event_type"""))

  /** Gap-based sessionization (batch form; the stateful streaming twin
    * is Sessionize.streaming, equivalence-tested in StreamingSpec).
    * Gap arithmetic uses whole seconds in BOTH engines (Spark
    * unix_timestamp floors; the oracle floors epoch()). */
  val st4 = Q(
    "st_sessionize",
    (s, d) => Sessionize.batch(Tables.events(s, d)),
    Some("""SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
                   n_events
            FROM (
              SELECT user_id, session_id, MIN(ts) AS session_start,
                     COUNT(*) AS n_events
              FROM (
                SELECT user_id, ts,
                       SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS session_id
                FROM (
                  SELECT user_id, ts,
                         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                IS NULL
                              OR CAST(floor(epoch(ts)) AS BIGINT) -
                                 CAST(floor(epoch(LAG(ts) OVER (PARTITION BY
                                   user_id ORDER BY ts))) AS BIGINT) > 1800
                              THEN 1 ELSE 0 END AS new_session
                  FROM events))
              GROUP BY user_id, session_id)
            ORDER BY user_id, session_id"""))

  /** Click→purchase pairs within one hour, per user — the batch twin
    * of a watermarked stream-stream interval join (StreamingSpec runs
    * the same shape as two readStreams and asserts pair-count parity).
    *
    * Scale: an equi join on user_id (one shuffle) with the time bound
    * as a residual predicate — never a cartesian. In the streaming
    * form the watermark bounds join state to ~1 hour per side. */
  def funnelPairs(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
  }

  val st5 = Q(
    "st_stream_join_funnel",
    (s, d) =>
      funnelPairs(Tables.events(s, d))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_pairs"),
          min(col("p_ts").cast("long") - col("click_ts").cast("long"))
            .as("min_lag_s"))
        .orderBy("user_id"),
    Some("""SELECT c.user_id, COUNT(*) AS n_pairs,
                   MIN(CAST(floor(epoch(p.ts)) AS BIGINT) -
                       CAST(floor(epoch(c.ts)) AS BIGINT)) AS min_lag_s
            FROM events c JOIN events p
              ON c.user_id = p.user_id
             AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
            WHERE c.event_type = 'click' AND p.event_type = 'purchase'
            GROUP BY c.user_id ORDER BY c.user_id"""))

  /** Debounce dedup: collapse repeats of (user, type) within the same
    * minute — the batch twin of streaming dropDuplicates behind a
    * watermark (parity in StreamingSpec). dropDuplicates keeps an
    * arbitrary representative, so the query emits only group COUNTS,
    * which are deterministic. */
  val st6 = Q(
    "st_dedup_debounce",
    (s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          date_trunc("minute", col("ts")).as("minute"))
        .dropDuplicates("user_id", "event_type", "minute")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_distinct"))
        .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS n_distinct
            FROM (SELECT DISTINCT user_id, event_type,
                         date_trunc('minute', ts) AS minute
                  FROM events)
            GROUP BY event_type ORDER BY event_type"""))

  /** Time-series gap-fill: hourly grid per user over purchase events,
    * forward-filled (operators.GapFill = sequence Generate + as-of
    * join). The oracle rebuilds it with DuckDB generate_series + ASOF
    * LEFT JOIN; n_filled vs n_points is part of the hash — they differ
    * exactly when a key's aligned-down grid start precedes its first
    * observation (leading NULL), and both engines must agree on it. */
  val st7 = Q(
    "st_gapfill_hourly",
    (s, d) => {
      val purchases = graft.operators.AsofJoin.dedupeBuild(
        Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"), col("event_id")),
        "user_id", "ts", Seq("value"), tiebreakCol = "event_id")
      graft.operators.GapFill
        .forwardFill(purchases, "user_id", "ts", "value", 3600L)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_points"),
          count(col("value")).as("n_filled"),
          round(sum(col("value")), 2).as("total_filled"))
        .orderBy("user_id")
    },
    Some("""WITH obs AS (
              SELECT user_id, ts, arg_max(value, event_id) AS value
              FROM events WHERE event_type = 'purchase'
              GROUP BY user_id, ts),
            bounds AS (
              SELECT user_id,
                to_timestamp(CAST(floor(epoch(MIN(ts))) AS BIGINT)
                  - CAST(floor(epoch(MIN(ts))) AS BIGINT) % 3600) AS t0,
                to_timestamp(CAST(floor(epoch(MAX(ts))) AS BIGINT)
                  + (3600 - CAST(floor(epoch(MAX(ts))) AS BIGINT) % 3600) % 3600)
                  AS t1
              FROM obs GROUP BY user_id),
            grid AS (
              SELECT user_id,
                     unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS grid_ts
              FROM bounds),
            filled AS (
              SELECT g.user_id, g.grid_ts, o.value
              FROM grid g ASOF LEFT JOIN obs o
                ON g.user_id = o.user_id AND g.grid_ts >= o.ts)
            SELECT user_id, COUNT(*) AS n_points, COUNT(value) AS n_filled,
                   ROUND(SUM(value), 2) AS total_filled
            FROM filled GROUP BY user_id ORDER BY user_id"""))

  /** Unwindowed running aggregate, shared batch/stream: heavy users
    * by total event count. In streaming this is a complete-mode
    * global aggregate (state = one row per user, emitted in full each
    * trigger) — the mode the other twins don't exercise; parity is
    * pinned in StreamingSpec. Batch form is oracle-checked. */
  def heavyUsers(events: DataFrame, minCount: Long): DataFrame =
    events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= minCount)

  val st8 = Q(
    "st_heavy_users",
    (s, d) => heavyUsers(Tables.events(s, d), 50L).orderBy("user_id"),
    Some("""SELECT user_id, COUNT(*) AS n_rows
            FROM events GROUP BY user_id HAVING n_rows >= 50
            ORDER BY user_id"""))

  /** Stream-static incremental dedup, batch twin
    * ([[Incremental.dedupVsCorpus]] runs unchanged under readStream —
    * the anti-join on content digest is stream-static in append mode;
    * the streaming runtime is pinned in StreamingSpec). Ten planted
    * exact copies of reference docs prove the drop path; the kept
    * count proves the feed survives. */
  val st9 = Q(
    "st_dedup_vs_corpus",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val reference = docs.filter(col("doc_id") % 2 === 0)
      val incoming = docs.filter(col("doc_id") % 2 === 1)
        .unionByName(reference.filter(col("doc_id") < 20)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      Incremental.dedupVsCorpus(incoming, reference)
        .agg(count(lit(1)).as("n_kept"),
          count(when(col("doc_id") >= 1000000L, true)).as("n_planted_kept"))
    },
    Some("""WITH ref AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
              inc AS (SELECT doc_id, text FROM documents
                      WHERE doc_id % 2 = 1
                      UNION ALL
                      SELECT doc_id + 1000000 AS doc_id, text
                      FROM documents
                      WHERE doc_id % 2 = 0 AND doc_id < 20)
            SELECT COUNT(*) AS n_kept,
                   COUNT(CASE WHEN i.doc_id >= 1000000 THEN 1 END)
                     AS n_planted_kept
            FROM inc i
            WHERE NOT EXISTS (
              SELECT 1 FROM ref r WHERE r.text = i.text)"""))

  /** Index-served twin of `st_dedup_vs_corpus`
    * ([[Incremental.dedupVsIndex]]): the anti-join's static side is a
    * persisted LSH index's digest table — the streaming deployment
    * never re-digests the reference at setup. Same planted copies,
    * same oracle verbatim (index-served ≡ corpus-served by
    * construction; a drift between them fails this row). Runtime
    * parity pinned in StreamingSpec. */
  val st9x = Q(
    "st_dedup_vs_index",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val reference = docs.filter(col("doc_id") % 2 === 0)
      val incoming = docs.filter(col("doc_id") % 2 === 1)
        .unionByName(reference.filter(col("doc_id") < 20)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      val path = "target/lsh_index_" +
        java.lang.Integer.toHexString(d.hashCode)
      if (!graft.llm.Dedup.lshIndexExists(s, path))
        graft.llm.Dedup.writeLshIndex(reference, path)
      Incremental.dedupVsIndex(incoming, path)
        .agg(count(lit(1)).as("n_kept"),
          count(when(col("doc_id") >= 1000000L, true)).as("n_planted_kept"))
    },
    st9.oracle)

  /** Stream-static line cleaning, batch twin
    * ([[Incremental.cleanLinesVsHotSet]] runs unchanged under
    * readStream — per-row HOF filtering against a broadcast frozen
    * hot-line set, no aggregation; runtime pinned in StreamingSpec).
    * Lines are synthesized 8-token chunks (fixture texts have no
    * newlines — same construction as `dedup_lines_corpus`), a banner
    * line planted in ~20% of BOTH halves makes the hot set provably
    * strip it from incoming docs, and the oracle re-derives the
    * frozen hot set from the reference half and every reassembled
    * document. */
  val st10 = Q(
    "st_clean_lines",
    (s, d) => {
      val banner = "streamclean shared banner line"
      val toks = split(trim(col("text")), "\\s+")
      val lined = Tables.documents(s, d).select(
        col("doc_id"),
        concat(
          when(col("doc_id") % 100 < 20, lit(banner + "\n"))
            .otherwise(lit("")),
          array_join(
            transform(sequence(lit(0), size(toks) - 1, lit(8)),
              st => array_join(slice(toks, st + 1, lit(8)), " ")),
            "\n")).as("text"))
      val reference = lined.filter(col("doc_id") % 2 === 0)
      val incoming = lined.filter(col("doc_id") % 2 === 1)
      val hot = graft.llm.LineDedup.lineFrequencies(reference)
        .filter(col("n_docs") >= 2).select("line")
      Incremental.cleanLinesVsHotSet(incoming, hot)
        .select(
          col("doc_id"), col("n_lines"), col("n_kept"), col("n_removed"),
          substring(sha2(col("kept_text"), 256), 1, 16).as("kept_digest"))
        .orderBy("doc_id")
        .limit(500)
    },
    Some("""WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents),
            lined AS (
              SELECT doc_id,
                     list_concat(
                       CASE WHEN doc_id % 100 < 20
                         THEN ['streamclean shared banner line']
                         ELSE []::VARCHAR[] END,
                       list_transform(range(0, GREATEST(len(t), 1), 8),
                         s -> array_to_string(t[s+1:s+8], ' '))) AS lines
              FROM toks),
            exploded AS (
              SELECT doc_id,
                     unnest(lines) AS line,
                     unnest(range(1, len(lines)+1)) AS pos
              FROM lined),
            norm AS (
              SELECT doc_id, trim(line) AS line, pos
              FROM exploded WHERE trim(line) <> ''),
            hot AS (
              SELECT line FROM norm WHERE doc_id % 2 = 0
              GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2),
            inc AS (SELECT * FROM norm WHERE doc_id % 2 = 1),
            kept AS (
              SELECT i.doc_id, i.line, i.pos FROM inc i
              WHERE i.line NOT IN (SELECT line FROM hot)),
            agg AS (
              SELECT doc_id, COUNT(*) AS n_kept,
                     string_agg(line, chr(10) ORDER BY pos) AS kept_text
              FROM kept GROUP BY doc_id),
            tot AS (
              SELECT doc_id, COUNT(*) AS n_lines FROM inc GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(t.n_lines, 0) AS n_lines,
                   COALESCE(a.n_kept, 0) AS n_kept,
                   COALESCE(t.n_lines, 0) - COALESCE(a.n_kept, 0)
                     AS n_removed,
                   substring(sha256(COALESCE(a.kept_text, '')), 1, 16)
                     AS kept_digest
            FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
            LEFT JOIN tot t USING (doc_id)
            LEFT JOIN agg a USING (doc_id)
            ORDER BY doc_id LIMIT 500"""))

  /** Frozen-recipe temperature sampling, batch twin of
    * [[Incremental.sampleVsFrozen]] (the streaming mixture-sampler
    * deployment: thresholds frozen at setup, micro-batches filter
    * narrowly — StreamingSpec pins stream ≡ batch). Reference here is
    * the corpus itself, so the result is exactly the one-shot
    * `temperatureSample` at budget 900; the oracle rederives the full
    * integer recipe and the exact kept set, membership pinned by
    * id-sum. */
  val st11 = Q(
    "st_temperature_sample",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Incremental.sampleVsFrozen(docs, docs, totalBudgetTokens = 900L)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs_kept"),
          sum(graft.llm.TextAnalysis.tokenCount(col("text")))
            .as("n_tokens_kept"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy("source")
    },
    Some("""WITH t AS (
              SELECT doc_id, source,
                     CAST(len(string_split_regex(trim(text), '\s+'))
                       AS BIGINT) AS n_tokens,
                     list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         list_transform(string_split_regex(
                           CAST(doc_id AS VARCHAR) || '#temp', ''),
                           c -> CAST(ascii(c) AS BIGINT))),
                       (acc, x) -> (acc * 131 + x) % 2147483647) % 1000000
                       AS b
              FROM documents),
            per_src AS (
              SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
              FROM t GROUP BY source),
            tot AS (
              SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens
              FROM per_src),
            w AS (
              SELECT source, src_tokens,
                     CAST(floor(sqrt(CAST(
                       (src_tokens * 1000000 // total_tokens) * 1000000
                       AS DOUBLE))) AS BIGINT) AS w
              FROM per_src, tot),
            sw AS (SELECT CAST(SUM(w) AS BIGINT) AS sum_w FROM w),
            thr AS (
              SELECT source,
                     least(1000000,
                       (900 * w // sum_w) * 1000000 // src_tokens)
                       AS keep_threshold
              FROM w, sw)
            SELECT t.source, COUNT(*) AS n_docs_kept,
                   CAST(SUM(t.n_tokens) AS BIGINT) AS n_tokens_kept,
                   CAST(SUM(t.doc_id) AS BIGINT) AS id_sum
            FROM t JOIN thr ON t.source = thr.source
            WHERE t.b < thr.keep_threshold
            GROUP BY t.source ORDER BY t.source"""))

  /** Frozen-model DSIR filtering, batch twin of
    * [[Incremental.dsirStream]] (the streaming importance filter:
    * model frozen at setup as a map literal, micro-batches scored and
    * filtered row-locally — StreamingSpec pins stream ≡ batch).
    * Raw/target references are the corpus itself / its English slice;
    * the threshold sits inside the OVERLAP of the sf0.001 and sf0.01
    * score ranges (scores scale-shift with corpus size), so the
    * filter visibly splits BOTH small fixtures — 5/500 kept at
    * sf0.001, 497/500 at sf0.01 — and never degenerates to zero rows;
    * at sf0.1 everything clears it, which the oracle reproduces.
    * Membership pinned per-lang by count + id-sum. */
  /** Incremental ANN-index maintenance, batch twin
    * ([[graft.llm.Quantize.appendToPqIndex]]; the stream arm is
    * [[Incremental.annIndexAppendStream]], runtime parity pinned in
    * StreamingSpec): the even half of the corpus trains a persisted
    * IVF-PQ index ONCE, the odd half arrives later and is appended —
    * assigned to the FROZEN coarse quantizer and encoded with the
    * FROZEN codebook — and the probe searches the grown index. FULL
    * row-level oracle: DuckDB re-trains both Lloyd rounds on the even
    * half only, assigns ALL vectors to those frozen centroids,
    * re-derives the frozen 16-entry codebook (even half's lowest
    * ids), every code, the query distance table, and every summed
    * ADC distance. The BASE index is built once under target/ (keyed
    * on the immutable fixture dir, the pqIndexFor pattern) and each
    * run appends into a fresh file-copy of it, so the run-to-run work
    * is the append + probe — the actual operators under test — while
    * staying idempotent. Query vector 7 is itself an APPENDED vector —
    * probing with it proves appended rows are first-class
    * searchable. */
  val st13 = Q(
    "st_ann_index_append",
    (s, d) => {
      import graft.llm.Quantize
      val embs = Tables.embeddings(s, d)
      val base = embs.filter(col("vec_id") % 2 === 0)
      val incoming = embs.filter(col("vec_id") % 2 === 1)
      val basePath = "target/pq_append_base_" +
        java.lang.Integer.toHexString(d.hashCode)
      if (!Quantize.pqIndexExists(s, basePath))
        Quantize.writePqIndex(base, basePath, nlist = 4, iters = 2,
          m = 8, k = 16)
      // copy INTO a not-yet-existing dst so the copy IS the index
      // root (an existing dst would nest the source dir under it)
      val path = java.nio.file.Files
        .createTempDirectory("pq_append_index").toString + "/idx"
      val conf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(basePath)
        .getFileSystem(conf)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(basePath),
        fs, new org.apache.hadoop.fs.Path(path),
        false, true, conf)
      Quantize.appendToPqIndex(incoming, path)
      val qv = embs.filter(col("vec_id") === 7)
        .select(col("embedding")).collect().headOption
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
        .getOrElse(Array.fill(64)(0.0))
      Quantize.ivfPqTopKIndexed(s, path, qv, topK = 10, nprobe = 2,
        excludeId = 7L)
    },
    Some("""WITH allv AS (SELECT vec_id, embedding::DOUBLE[] AS v
                          FROM embeddings),
            emb AS (SELECT vec_id, v FROM allv WHERE vec_id % 2 = 0),
            c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                            AS BIGINT) AS cid, v AS c
                   FROM (SELECT vec_id, v FROM emb
                         ORDER BY vec_id LIMIT 4)),
            s1 AS (SELECT e.vec_id, e.v, c.cid,
                          round(list_cosine_similarity(e.v, c.c), 6) AS cos
                   FROM emb e CROSS JOIN c0 c),
            a1 AS (SELECT vec_id, v, cid FROM (
                     SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY cos DESC, cid) AS rn FROM s1)
                   WHERE rn = 1),
            m1 AS (SELECT cid, pos, ROUND(AVG(e), 6) AS m
                   FROM (SELECT cid, unnest(v) AS e,
                                unnest(generate_series(1, len(v))) AS pos
                         FROM a1)
                   GROUP BY cid, pos),
            n1 AS (SELECT cid, list(m ORDER BY pos) AS c
                   FROM m1 GROUP BY cid),
            c1 AS (SELECT p.cid, coalesce(n.c, p.c) AS c
                   FROM c0 p LEFT JOIN n1 n USING (cid)),
            s2 AS (SELECT e.vec_id, e.v, c.cid,
                          round(list_cosine_similarity(e.v, c.c), 6) AS cos
                   FROM emb e CROSS JOIN c1 c),
            a2 AS (SELECT vec_id, v, cid FROM (
                     SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY cos DESC, cid) AS rn FROM s2)
                   WHERE rn = 1),
            m2 AS (SELECT cid, pos, ROUND(AVG(e), 6) AS m
                   FROM (SELECT cid, unnest(v) AS e,
                                unnest(generate_series(1, len(v))) AS pos
                         FROM a2)
                   GROUP BY cid, pos),
            n2 AS (SELECT cid, list(m ORDER BY pos) AS c
                   FROM m2 GROUP BY cid),
            c2 AS (SELECT p.cid, coalesce(n.c, p.c) AS c
                   FROM c1 p LEFT JOIN n2 n USING (cid)),
            sf AS (SELECT e.vec_id, e.v, c.cid,
                          round(list_cosine_similarity(e.v, c.c), 6) AS cos
                   FROM allv e CROSS JOIN c2 c),
            af AS (SELECT vec_id, v, cid FROM (
                     SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY cos DESC, cid) AS rn FROM sf)
                   WHERE rn = 1),
            qv AS (SELECT v FROM allv WHERE vec_id = 7),
            probe AS (SELECT cid FROM (
                        SELECT c.cid,
                               round(list_cosine_similarity(c.c, q.v), 6)
                                 AS qc
                        FROM c2 c CROSS JOIN qv q)
                      ORDER BY qc DESC, cid LIMIT 2),
            cb AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS ci,
                          v AS c_vec
                   FROM emb ORDER BY vec_id LIMIT 16),
            pr AS (SELECT af.vec_id, af.v FROM af JOIN probe USING (cid)
                   WHERE af.vec_id <> 7),
            scored AS (
              SELECT pr.vec_id, sp.s AS s, cb.ci,
                     ROUND(list_sum([
                       (pr.v[sp.s * 8 + i] - cb.c_vec[sp.s * 8 + i]) ^ 2
                       for i in range(1, 9)]), 6) AS dist
              FROM pr, UNNEST(range(0, 8)) AS sp(s), cb),
            best AS (
              SELECT vec_id, s, ci,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, s
                       ORDER BY dist, ci) AS rk
              FROM scored),
            dt AS (
              SELECT sp.s AS s, cb.ci,
                     ROUND(list_sum([
                       (q.v[sp.s * 8 + i] - cb.c_vec[sp.s * 8 + i]) ^ 2
                       for i in range(1, 9)]), 6) AS d
              FROM qv q, UNNEST(range(0, 8)) AS sp(s), cb),
            adc AS (
              SELECT b.vec_id, ROUND(SUM(dt.d), 4) AS adc_dist
              FROM (SELECT * FROM best WHERE rk = 1) b
              JOIN dt ON dt.s = b.s AND dt.ci = b.ci
              GROUP BY b.vec_id)
            SELECT vec_id, adc_dist FROM adc
            ORDER BY adc_dist, vec_id LIMIT 10"""))

  /** Incremental BM25-index maintenance, batch twin
    * ([[graft.llm.Retrieval.appendToBm25Index]]; stream arm
    * [[Incremental.bm25IndexAppendStream]], runtime parity in
    * StreamingSpec): the even half of the corpus builds the inverted
    * index ONCE, the odd half arrives later and FOLDS IN — postings
    * append, df/stats merge exactly — and the probe searches the
    * grown index. Because every stored statistic is associative, the
    * appended index ≡ a full-corpus rebuild ≡ live full-corpus
    * scoring, so the `text_bm25_topk` oracle applies VERBATIM — the
    * strongest possible append contract (the ANN twin's frozen
    * quantizer can only claim append ≡ frozen-train; this claims
    * append ≡ rebuild). Fresh temp copy of the base index per run:
    * each run's append must land as a fresh delta, not accumulate on
    * the shared fixture (appends are idempotent per SEGMENT id, and
    * each run draws a new one). */
  val st14 = Q(
    "st_bm25_index_append",
    (s, d) => {
      import graft.llm.Retrieval
      val docs = Tables.documents(s, d)
      val basePath = "target/bm25_append_base_" +
        java.lang.Integer.toHexString(d.hashCode)
      if (!Retrieval.bm25IndexExists(s, basePath))
        Retrieval.writeBm25Index(
          docs.filter(col("doc_id") % 2 === 0), basePath)
      val path = java.nio.file.Files
        .createTempDirectory("bm25_append_index").toString + "/idx"
      val conf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(basePath)
        .getFileSystem(conf)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(basePath),
        fs, new org.apache.hadoop.fs.Path(path),
        false, true, conf)
      Retrieval.appendToBm25Index(
        docs.filter(col("doc_id") % 2 === 1), path)
      Retrieval.bm25TopKIndexed(s, path,
        Seq("hash", "merge", "scan"), k = 15)
    },
    graft.llm.LlmQueries.bm25TopK.oracle)

  /** Incremental LSH-dedup-index maintenance, batch twin
    * ([[graft.llm.Dedup.appendToLshIndex]]; stream arm
    * [[Incremental.lshIndexAppendStream]], runtime parity in
    * StreamingSpec): half the reference corpus (doc_id % 4 == 0)
    * builds the dedup index ONCE, the other half (% 4 == 2) is
    * vetted later and FOLDS IN — rows append, bucket counts merge
    * exactly — and the incoming batch dedups against the GROWN index.
    * Appended reference = the even half = `dedup_incremental`'s
    * reference, and append ≡ rebuild by associativity, so the
    * `dedup_incremental` oracle applies VERBATIM. Fresh temp copy of
    * the base index per run: each run's append must land as a fresh
    * delta, not accumulate on the shared fixture (appends are
    * idempotent per SEGMENT id, and each run draws a new one). */
  val st15 = Q(
    "st_lsh_index_append",
    (s, d) => {
      import graft.llm.Dedup
      val docs = Tables.documents(s, d)
      val baseRef = docs.filter(col("doc_id") % 4 === 0)
      val lateRef = docs.filter(col("doc_id") % 4 === 2)
      val planted = docs.filter(col("doc_id") % 2 === 0)
        .filter(col("doc_id") < 20)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val incoming = docs.filter(col("doc_id") % 2 === 1)
        .unionByName(planted)
      val basePath = "target/lsh_append_base_" +
        java.lang.Integer.toHexString(d.hashCode)
      if (!Dedup.lshIndexExists(s, basePath))
        Dedup.writeLshIndex(baseRef, basePath)
      val path = java.nio.file.Files
        .createTempDirectory("lsh_append_index").toString + "/idx"
      val conf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(basePath)
        .getFileSystem(conf)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(basePath),
        fs, new org.apache.hadoop.fs.Path(path),
        false, true, conf)
      Dedup.appendToLshIndex(lateRef, path)
      Dedup.incrementalDedupIndexedWithAudit(incoming, path)._2
    },
    graft.llm.LlmQueries.dedupIncremental.oracle)

  /** Incremental dense-tower maintenance, batch twin
    * ([[graft.llm.Retrieval.appendToDenseIndex]]; stream arm
    * [[Incremental.denseIndexAppendStream]], runtime parity in
    * StreamingSpec): the even half of the corpus builds the dense
    * vector index ONCE, the odd half arrives later and folds in (one
    * segment; vectors computed at the stored dims), and the probe is
    * the FULLY index-served hybrid over the grown towers — append ≡
    * rebuild because stored vectors are per-doc rows, so
    * `text_hybrid_rrf`'s oracle applies VERBATIM. Fresh temp copy of
    * the base index per run, as with the other three families. */
  val st16 = Q(
    "st_dense_index_append",
    (s, d) => {
      import s.implicits._
      import graft.llm.Retrieval
      val docs = Tables.documents(s, d)
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val bm25Path = s"target/bm25_index_$tag"
      if (!Retrieval.bm25IndexExists(s, bm25Path))
        Retrieval.writeBm25Index(docs, bm25Path)
      val basePath = s"target/dense_append_base_$tag"
      if (!Retrieval.denseIndexExists(s, basePath))
        Retrieval.writeDenseIndex(
          docs.filter(col("doc_id") % 2 === 0), basePath)
      val path = java.nio.file.Files
        .createTempDirectory("dense_append_index").toString + "/idx"
      val conf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(basePath)
        .getFileSystem(conf)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(basePath),
        fs, new org.apache.hadoop.fs.Path(path),
        false, true, conf)
      Retrieval.appendToDenseIndex(
        docs.filter(col("doc_id") % 2 === 1), path)
      val qs = Seq((0, "hash join merge"), (1, "filter scan index"))
        .toDF("query_id", "query_text")
      Retrieval.hybridTopKFullyIndexed(s, bm25Path, path, qs,
          k = 10, nPerSide = 20)
        .orderBy("query_id", "rank")
    },
    graft.llm.LlmQueries.hybridTopKQ.oracle)

  val st12 = Q(
    "st_dsir_filter",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.llm.Importance.frozenScorer(
          raw = docs,
          target = docs.filter(col("lang") === "en"),
          minAvgLogRatio = -0.18)(docs)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy("lang")
    },
    Some("""WITH toks AS (
              SELECT doc_id, lang,
                     unnest(string_split_regex(
                       trim(lower(coalesce(text, ''))), '\s+')) AS token
              FROM documents),
            f AS (
              SELECT doc_id, lang,
                     list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         list_transform(string_split_regex(
                           token || '#dsir', ''),
                           c -> CAST(ascii(c) AS BIGINT))),
                       (acc, x) -> (acc * 131 + x) % 2147483647) % 4096
                       AS feat
              FROM toks),
            tc AS (
              SELECT feat, COUNT(*) AS cnt_t FROM f
              WHERE lang = 'en' GROUP BY feat),
            rc AS (SELECT feat, COUNT(*) AS cnt_r FROM f GROUP BY feat),
            tot AS (
              SELECT (SELECT SUM(cnt_t) FROM tc) AS n_t,
                     (SELECT SUM(cnt_r) FROM rc) AS n_r),
            scores AS (
              SELECT f.doc_id,
                     ROUND(AVG(
                       ln(CAST(coalesce(tc.cnt_t, 0) + 1 AS DOUBLE) /
                          CAST(tot.n_t + 4096 AS DOUBLE)) -
                       ln(CAST(rc.cnt_r + 1 AS DOUBLE) /
                          CAST(tot.n_r + 4096 AS DOUBLE))), 4) AS w
              FROM f LEFT JOIN tc USING (feat) JOIN rc USING (feat), tot
              GROUP BY f.doc_id),
            kept AS (SELECT doc_id FROM scores WHERE w >= -0.18)
            SELECT d.lang, COUNT(*) AS n_kept,
                   CAST(SUM(d.doc_id) AS BIGINT) AS id_sum
            FROM documents d JOIN kept USING (doc_id)
            GROUP BY d.lang ORDER BY d.lang"""))

  def all: Seq[Q] = Seq(st1, st2, st3, st4, st5, st6, st7, st8, st9, st9x,
    st10, st11, st12, st13, st14, st15, st16)
}
