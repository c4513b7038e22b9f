package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, all as
  * codegen-friendly Column expressions (no UDFs) so they stay inside
  * WholeStageCodegen and scale linearly with executors.
  *
  * The reference's text handling stops at LENGTH() and LIKE
  * (demo_optimized_data.py:61,96,112-117); these are the extensions the
  * project brief requires for 100 TB curation work.
  */
object TextAnalysis {

  /** Whitespace tokens. `trim` first: Spark's split keeps trailing empty
    * strings, so un-trimmed text would off-by-one the count. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: word chunks of ≤4 chars + digits + punct as
    * separate tokens — a deterministic stand-in for a real tokenizer's
    * token count (the real BPE vocab isn't in this container). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[a-z]{1,4}|[A-Z][a-z]{0,3}|[0-9]|[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("long")

  /** Stopword profiles per language for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: broadcast-literal arrays, evaluated
    * per-row with higher-order functions — no shuffle, no join. */
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "que"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "ist"),
    "zh" -> Seq("的", "一", "是", "不", "了", "人", "我", "在", "有", "他"))

  /** Count of tokens that are members of `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*))).cast("long")

  /** Stopword ratio against the English list (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    round(stopwordHits(t, stopwords("en")).cast("double") /
      greatest(size(t).cast("double"), lit(1.0)), 4)
  }

  /** Punctuation character ratio. Spark regexp_replace is global by
    * default (DuckDB needs the 'g' flag — mirrored in the oracle SQL). */
  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0)), 4)

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation noise and a natural stopword rate — the standard
    * pre-training quality-filter shape (length/punct/stopword ratios). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    round((lenScore + punctPenalty + stopScore) / 3.0, 4)
  }

  /** Language-ID: per-language stopword hit rate, argmax. Pure column
    * algebra: builds (lang, hits) structs, array_max on (hits, -idx)
    * picks the winner deterministically (ties → earlier list order). */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val scored = stopwords.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((langCode, words), i) =>
        struct(
          stopwordHits(t, words).as("hits"),
          lit(-i).as("ord"),
          lit(langCode).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Polynomial rolling-hash fingerprint of normalized text, modulo a
    * 31-bit prime so the arithmetic is overflow-free (and therefore
    * portable to any oracle). Normalization: lowercase, collapse
    * whitespace — near-identical docs with formatting drift collide.
    * The hash itself is the codegen TextHash expression (single pass;
    * the HOF form allocated a UTF8String per character). */
  def fingerprint(text: Column): Column =
    graft.functions.TextHash.text_hash(
      regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Type-token ratio: distinct tokens / tokens — the basic vocabulary
    * richness signal (low TTR ⇒ repetitive doc). */
  def typeTokenRatio(text: Column): Column = {
    val t = tokens(text)
    round(size(array_distinct(t)).cast("double") /
      greatest(size(t).cast("double"), lit(1.0)), 4)
  }

  /** Word n-gram array (order-preserving, duplicates kept — repetition
    * metrics need the multiset, unlike dedup shingling which distincts).
    *
    * Shape matters here: a lambda that indexes back into the outer
    * token array (`transform(seq, i => slice(t, i, n))`) re-evaluates
    * the WHOLE `t` expression tree per element — Catalyst inlines
    * outer references into the lambda body, and when `t` is a regex
    * split that means one Pattern.compile + full re-tokenize per
    * element, O(T²) per row (measured ~100 ms/row on 54-token docs —
    * a 10-minute single-task stall at sf0.1). The zip_with chain
    * below evaluates each shifted slice ONCE per row and the lambdas
    * touch only their element variables: O(n·T) per row. */
  private[llm] def ngrams(t: Column, n: Int): Column = {
    val m = greatest(size(t) - (n - 1), lit(0))
    (0 until n)
      .map(k => slice(t, lit(k + 1), m))
      .reduceLeft((acc, p) => zip_with(acc, p, (a, b) => concat(a, lit(" "), b)))
  }

  /** Fraction of all bigram occurrences taken by the single most
    * frequent bigram (the Gopher-rules "top 2-gram fraction"
    * repetition filter). The count of the modal bigram = the longest
    * run of equal adjacent elements in the SORTED bigram array — an
    * O(n log n) row-local fold, vs the naive distinct×filter scan
    * that goes quadratic on long documents. */
  def topBigramFraction(text: Column): Column = {
    // Fold over the sorted array ITSELF, carrying the previous element
    // in the accumulator — indexing back into `s` via element_at from
    // inside the lambda would re-evaluate the whole sort+ngrams tree
    // twice per step (see the ngrams scaladoc), O(T³) per row in the
    // degenerate case. Here `s` is evaluated once as the fold input.
    val s = array_sort(ngrams(tokens(text), 2))
    val n = greatest(size(tokens(text)) - 1, lit(0)) // = size(s), one split
    val top = aggregate(
      s,
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"),
        lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(n > 0, round(top.cast("double") / n.cast("double"), 4))
      .otherwise(lit(0.0))
  }

  /** Fraction of 5-gram occurrences that are repeats of an earlier one
    * (the Gopher-rules duplicate-5-gram filter; near 1.0 ⇒ the doc is
    * loops of the same phrase). */
  def dupNgramFraction(text: Column, n: Int = 5): Column = {
    // n-gram count derived from the token count (one split) instead of
    // re-evaluating the ngram array for each size() reference.
    val cnt = greatest(size(tokens(text)) - (n - 1), lit(0))
    when(cnt > 0,
      round(lit(1.0) -
        size(array_distinct(ngrams(tokens(text), n))).cast("double") /
          cnt.cast("double"), 4))
      .otherwise(lit(0.0))
  }

  /** PII patterns — Java-regex and RE2 compatible so the same pattern
    * strings run in Spark and any RE2-based oracle. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Redact emails/phone numbers (the pre-training scrub). Spark's
    * regexp_replace is global; RE2 oracles need the 'g' flag. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]")

  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Boilerplate / template-text signal (the C4-style curation cue):
    * per document, how much of it is text that also appears elsewhere
    * in the corpus — `n_shingles` distinct k-word shingles,
    * `n_shared` of them with corpus document-frequency > 1,
    * `shared_frac = n_shared / n_shingles`, and `max_df` (how many
    * documents carry its most-common shingle). High `shared_frac` at
    * low Jaccard-to-any-single-doc is exactly template text — headers,
    * footers, legal blurbs — which near-dup removal won't catch.
    *
    * Scale design: the corpus collapses to `(doc, shingle)` pairs
    * (distinct per doc by construction of [[Dedup.shingles]]); the
    * document frequency is a count WINDOW over the shingle key, so
    * one shuffle on the shingle annotates every pair in place — no
    * self-join, and no persisted intermediate (the round-8 revision
    * cached the pair frame to share it between a df-aggregate and a
    * join-back; the window needs neither, so the shingling scalar
    * work still runs once and the session cache stays empty). The
    * only shuffles are (shingle) then (doc). No doc×doc stage: df is
    * an aggregate, not a pairing. */
  def boilerplateScores(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shingle")
    docs
      .select(col(idCol),
        explode(Dedup.shingles(col(textCol), k)).as("shingle"))
      .withColumn("df", count(lit(1)).over(w))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_shingles"),
        count(when(col("df") > 1, true)).as("n_shared"),
        max(col("df")).as("max_df"))
      .withColumn("shared_frac",
        round(col("n_shared").cast("double") / col("n_shingles"), 4))
  }

  /** Canonical text normalization — the first step of every training
    * pipeline, applied BEFORE hashing/dedup so near-identical bytes
    * (case, stray control chars, whitespace runs) collapse to one
    * canonical form: lowercase → control chars (`\p{Cc}`) to spaces →
    * whitespace runs to one space → trim. Pure codegen column algebra
    * (no UDF); the pattern vocabulary is Java-regex ∩ RE2 so the same
    * strings run in Spark and an RE2-based oracle. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "\\p{Cc}", " "), "\\s+", " "))

  /** Strip HTML/XML markup and unescape the basic entities — the
    * text-extraction normalize a web-crawl corpus runs before any
    * tokenizing/dedup (tags survive naive extraction and then pollute
    * shingles, n-gram stats and dedup keys). Tags (`<[^>]*>`) become
    * spaces, the five standard entities unescape (`&amp;` LAST, so
    * `&amp;lt;` yields the literal `&lt;` rather than re-unescaping
    * to `<`), whitespace collapses, ends trim. Pure codegen column
    * algebra; every pattern is Java-regex ∩ RE2 so an RE2 oracle
    * replays it verbatim. */
  def stripMarkup(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&amp;" -> "&") // amp last — see scaladoc
      .foldLeft(noTags) { case (c, (pat, rep)) =>
        regexp_replace(c, pat, rep)
      }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Top-k n-grams per source — the "what is actually in my corpus"
    * audit (crawl-template discovery, tokenizer sanity, boilerplate
    * triage) over exact integer counts. Tokens are the lowercased
    * `\s+` split; documents shorter than `n` tokens contribute
    * nothing; ties cut `(count DESC, gram ASC)` so the ranking is
    * total and engine-reproducible.
    *
    * Scale shape: one `(source, gram)`-keyed aggregate with map-side
    * partial counts (the explode never crosses the wire raw), then
    * per-source top-k through the bounded `collect_top_k` heap —
    * ≤ k rows per (source, map task) cross the second exchange, so a
    * source with a billion distinct grams costs its partial counts,
    * not a sorted shuffle; the final rank is a window over ≤ k rows
    * per source. */
  def topNgramsBySource(
      docs: DataFrame,
      n: Int = 2,
      k: Int = 10,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be ≥ 1: $n")
    require(k >= 1, s"k must be ≥ 1: $k")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(sourceCol).as("source"),
        explode(ngrams(tokens(lower(trim(col(textCol)))), n)).as("gram"))
      .groupBy("source", "gram")
      .agg(count(lit(1)).as("n_occurrences"))
    counts
      .groupBy("source")
      .agg(graft.functions.TopKAgg.collect_top_k(
        struct((-col("n_occurrences")).as("neg_n"), col("gram")),
        k, reverse = true).as("top"))
      .select(col("source"), explode(col("top")).as("e"))
      .select(col("source"), col("e.gram").as("gram"),
        (-col("e.neg_n")).as("n_occurrences"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("n_occurrences").desc, col("gram"))))
  }

  /** Zipf rank-frequency audit: the OLS slope of `ln(freq)` on
    * `ln(rank)` over the corpus's top-`topK` tokens — natural text
    * sits near −1; a slope far off it flags synthetic, templated, or
    * degenerate corpora (the cheap corpus-health check run per crawl
    * snapshot).
    *
    * Determinism: the regression inputs are quantized per vocab row
    * (`x = round(ln(rank)·1e6)`, `y = round(ln(cnt)·1e6)` as exact
    * integers — one `ln` + one round each, bit-identical on any IEEE
    * engine), so all OLS sums are exact integer arithmetic and the
    * slope/intercept are each one fixed scalar double expression over
    * those integers. No float summation order anywhere. Envelope:
    * Σx·y ≤ topK·(ln(topK)·1e6)·(ln(cnt_max)·1e6) — safe under 2^63
    * for topK ≤ 10⁴ and cnt ≤ 10¹⁵.
    *
    * Scale: one map-side-combined token count, a bounded top-K cut
    * (ties `(cnt DESC, token)`), then a scalar aggregate over ≤ topK
    * rows. The corpus collapses once and never shuffles wide. */
  def zipfAudit(
      docs: DataFrame,
      topK: Int = 200,
      textCol: String = "text"): DataFrame = {
    require(topK >= 2 && topK <= 10000, s"topK out of range: $topK")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val counts = docs
      .select(explode(tokens(lower(trim(coalesce(col(textCol),
        lit("")))))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_distinct_tokens"),
      coalesce(sum(col("cnt")), lit(0L)).as("n_tokens"))
    // Ranking without a global window (the HistogramSketch pattern —
    // PlanLint's unpartitioned-window rule stays clean): the bounded
    // top-K cut is a TakeOrdered, the ≤topK survivors collapse into
    // ONE collect_list row, and rank = position after an in-row
    // array_sort by (cnt DESC, token). Quantized regression inputs
    // (`x = round(ln(rank)·1e6)` etc.) make every OLS sum exact
    // integer arithmetic — no float summation order anywhere.
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(topK)
    val oneRow = top.agg(collect_list(
      struct((-col("cnt")).as("negc"), col("token").as("t"),
        col("cnt").as("c"))).as("a"))
    val pts = transform(array_sort(col("a")), (e, i) => struct(
      round(log((i + lit(1)).cast("double")) * lit(1e6)).cast("long")
        .as("x"),
      round(log(e.getField("c").cast("double")) * lit(1e6)).cast("long")
        .as("y")))
    val zero = struct(lit(0L).as("k"), lit(0L).as("sx"), lit(0L).as("sy"),
      lit(0L).as("sxy"), lit(0L).as("sxx"))
    val folded = aggregate(pts, zero, (acc, p) => struct(
      (acc.getField("k") + lit(1L)).as("k"),
      (acc.getField("sx") + p.getField("x")).as("sx"),
      (acc.getField("sy") + p.getField("y")).as("sy"),
      (acc.getField("sxy") + p.getField("x") * p.getField("y")).as("sxy"),
      (acc.getField("sxx") + p.getField("x") * p.getField("x")).as("sxx")))
    val sums = oneRow.select(
      folded.getField("k").as("k"),
      folded.getField("sx").as("sx"),
      folded.getField("sy").as("sy"),
      folded.getField("sxy").as("sxy"),
      folded.getField("sxx").as("sxx"))
    sums.crossJoin(broadcast(stats))
      .select(
        col("n_distinct_tokens"), col("n_tokens"),
        col("k").as("n_fit_points"),
        round(
          (col("k") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("k") * col("sxx") - col("sx") * col("sx")).cast("double"), 4)
          .as("zipf_slope"),
        round(
          ((col("sy").cast("double") -
            ((col("k") * col("sxy") - col("sx") * col("sy")).cast("double") /
             (col("k") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            col("sx").cast("double")) / col("k").cast("double")) / lit(1e6), 4)
          .as("zipf_intercept"))
  }

  /** Tokenizer fertility per language: characters per whitespace
    * token — the cheap proxy for how many subword pieces a tokenizer
    * will spend per word in each language (CJK text without spaces
    * shows up immediately as a huge value). Exact integer sums + one
    * display division. One map-side-combined aggregate. */
  def tokenizerFertility(
      docs: DataFrame,
      langCol: String = "lang",
      textCol: String = "text"): DataFrame =
    docs
      .groupBy(col(langCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(coalesce(col(textCol), lit("")))).cast("long")
          .as("n_chars"),
        sum(tokenCount(coalesce(col(textCol), lit("")))).as("n_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") /
          col("n_tokens").cast("double"), 4))
      .orderBy(langCol)

  /** One-row "dataset card" for a corpus: the summary block a
    * training-data release ships — sizes, exact-dup rate, language
    * mix entropy. Every column is either an exact integer or one
    * fixed scalar expression over exact integers (the entropy sums ≤
    * |languages| terms); three bounded aggregates total, the corpus
    * never shuffles wide. */
  def corpusCard(
      docs: DataFrame,
      textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCount(t)).as("n_tokens"),
      sum(length(t)).cast("long").as("n_chars"),
      countDistinct(Dedup.contentHash(col(textCol)))
        .as("n_distinct_docs"))
    val langs = docs.groupBy(col(langCol)).agg(count(lit(1)).as("n"))
    val lt = langs.agg(
      count(lit(1)).as("n_langs"),
      sum(col("n")).cast("double").as("t"))
    val p = col("n").cast("double") / col("t")
    val ent = langs.crossJoin(broadcast(lt))
      .agg(
        first(col("n_langs")).as("n_langs"),
        round(sum(-p * log(p)), 4).as("lang_entropy"))
    base.crossJoin(broadcast(ent))
      .select(
        col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_distinct_docs"),
        round(lit(1.0) -
          col("n_distinct_docs").cast("double") / col("n_docs"), 4)
          .as("exact_dup_rate"),
        col("n_langs"), col("lang_entropy"),
        round(col("n_tokens").cast("double") / col("n_docs"), 4)
          .as("avg_tokens_per_doc"))
  }

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS
    * copy-detection selector): hash every `k`-token gram with the
    * engine's rolling [[fingerprint]] hash, slide a `w`-wide window
    * over the hash sequence, and keep each window's MINIMUM — the
    * guarantee is that any shared substring of ≥ `k+w-1` tokens
    * yields at least one shared fingerprint, at ~1/w the storage of
    * the full k-gram set. Output: `(idCol, n_kgrams, fps)` with `fps`
    * the sorted DISTINCT window minima (winnowing's dedup of
    * consecutive repeats, strengthened to set semantics so the
    * surface is order-free and oracle-comparable).
    *
    * Shape note: the window minima come from a `zip_with` chain over
    * `w` shifted slices — each shifted copy of the hash array
    * evaluates ONCE per row (the [[ngrams]] lesson: a lambda indexing
    * back into the outer array re-evaluates its whole expression tree
    * per element, O(H²·k) per row). Pure row-local column algebra —
    * zero UDFs, zero shuffles, fuses into the scan. */
  def winnowFingerprints(
      docs: DataFrame,
      k: Int = 4,
      w: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be ≥ 1: $k")
    require(w >= 1, s"w must be ≥ 1: $w")
    // STAGED projections on purpose (the [[ngrams]] lesson, twice
    // over): (1) the token array becomes an attribute BEFORE the
    // k-gram transform, so the lambda's slice reads a bound column
    // instead of re-evaluating the split per element; (2) the hash
    // array becomes an attribute before the minima chain, whose w+1
    // references would otherwise each inline the whole
    // tokenize→gram→hash tree. The un-staged formulation measured
    // 2.5 ms/doc at sf0.1; this is the SpanDedup.windows shape.
    val tokStage = docs.select(col(idCol),
      tokens(lower(trim(coalesce(col(textCol), lit(""))))).as("__graft_ts"))
    val ts = col("__graft_ts")
    val hsExpr = when(size(ts) >= k,
      transform(sequence(lit(1), size(ts) - (k - 1)), i =>
        graft.functions.TextHash.text_hash(
          array_join(slice(ts, i, lit(k)), " "))))
      .otherwise(array().cast("array<bigint>"))
    val staged = tokStage.select(col(idCol), hsExpr.as("__graft_hs"))
    val hs = col("__graft_hs")
    val m = greatest(size(hs) - (w - 1), lit(0))
    val minima = (0 until w)
      .map(j => slice(hs, lit(j + 1), m))
      .reduceLeft((a, b) => zip_with(a, b, (x, y) => least(x, y)))
    staged.select(
      col(idCol),
      size(hs).cast("long").as("n_kgrams"),
      array_sort(array_distinct(minima)).as("fps"))
  }

  /** Copy-candidate pairs by shared winnowing fingerprints: documents
    * sharing ≥ `minShared` distinct selected fingerprints — the MOSS
    * plagiarism-detection join. A fingerprint's document frequency is
    * capped at `maxDf` (same boilerplate-excision role as the
    * containment dedup's shingle cap: a fingerprint in half the
    * corpus is boilerplate, not copying, and would otherwise fan the
    * join out df²). Returns `(id_a, id_b, n_shared)`, `id_a < id_b`.
    *
    * Scale shape: the corpus collapses to `(doc, fp)` — 8-byte
    * fingerprints, ~1/w of the k-gram count per doc; the df window
    * rides the join's own key (no extra exchange) and the cap bounds
    * every fingerprint's pair fan-out to maxDf². Never doc×doc.
    * EAGER: the (id, fps) frame is checkpointed before the explode —
    * see the barrier note in the body. */
  def winnowPairs(
      docs: DataFrame,
      k: Int = 4,
      w: Int = 4,
      minShared: Int = 2,
      maxDf: Int = 10,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minShared >= 1, s"minShared must be ≥ 1: $minShared")
    require(maxDf >= 2, s"maxDf must be ≥ 2: $maxDf")
    // materialization barrier BEFORE the explode: Generate over the
    // inline fingerprint expression re-evaluates the whole
    // tokenize→hash→minima tree per OUTPUT element (measured 5 ms/doc
    // vs 0.13 ms to compute the array once — 26 s vs 0.7 s at sf0.1),
    // so the tiny (id, fps) frame is checkpointed first and the
    // explode reads materialized arrays. The barrier also serves both
    // sides of the pair self-join. EAGER, like the other
    // checkpoint-backed dedup operators.
    val fpsFrame = winnowFingerprints(docs, k, w, idCol, textCol)
      .select(col(idCol), col("fps"))
      .localCheckpoint(true)
    val fp = fpsFrame.select(col(idCol), explode(col("fps")).as("fp"))
    val dfw = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val capped = fp
      .withColumn("df", count(lit(1)).over(dfw))
      .filter(col("df") <= maxDf)
      .select(col(idCol), col("fp"))
    val a = capped.select(col(idCol).as("id_a"), col("fp"))
    val b = capped.select(col(idCol).as("id_b"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The Gopher stopword set (Rae et al. 2021 §A1.1: a document must
    * contain ≥ 2 of these to pass the "contains stop words" rule). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style quality-rule flags (Rae et al. 2021 §A1.1 — the
    * canonical published pre-training filter set), one row per doc
    * with every metric, every per-rule boolean, and the composite
    * `pass`. Rules:
    *   r_words    — word count in [minWords, maxWords]
    *   r_wordlen  — mean word length in [3, 10]
    *   r_symbol   — (# + …)-to-word ratio ≤ 0.1
    *   r_alpha    — ≥ 80% of words contain an alphabetic char
    *   r_stop     — ≥ `minStopwords` DISTINCT Gopher stopwords present
    *                (published default 2; parameterized because a
    *                synthetic fixture vocabulary may carry fewer of
    *                the canonical eight)
    *   r_bullet   — ≤ 90% of lines start with a bullet ("• "/"- ")
    *   r_ellipsis — ≤ 30% of lines end with "..."
    *
    * Every metric is deterministic integer/ratio algebra (round-4
    * ratios), so the whole rule surface is oracle-recomputable.
    * Scale shape: pure per-row column algebra — HOFs over the token
    * split, zero UDFs, zero shuffles; fuses into the preceding scan,
    * and as a filter it pushes to wherever the corpus is scanned. */
  def gopherFlags(
      docs: DataFrame,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minStopwords: Int = 2,
      textCol: String = "text"): DataFrame =
    docs.select(col("doc_id") +: gopherMetricCols(textCol): _*)
      .withColumn("r_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_wordlen",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("r_symbol", col("symbol_ratio") <= 0.1)
      .withColumn("r_alpha", col("alpha_frac") >= 0.8)
      .withColumn("r_stop", col("n_stop") >= minStopwords)
      .withColumn("r_bullet", col("bullet_frac") <= 0.9)
      .withColumn("r_ellipsis", col("ellipsis_frac") <= 0.3)
      .withColumn("pass",
        col("r_words") && col("r_wordlen") && col("r_symbol") &&
          col("r_alpha") && col("r_stop") && col("r_bullet") &&
          col("r_ellipsis"))

  /** The seven Gopher metric columns, shared by [[gopherFlags]] and
    * [[gopherFilter]] so the act step re-derives NOTHING through a
    * self-join — the rules evaluate inline in the corpus scan. */
  private def gopherMetricCols(textCol: String): Seq[Column] = {
    val t = coalesce(col(textCol), lit(""))
    val toks = tokens(t)
    val nWords = size(toks).cast("long")
    val nw = greatest(nWords.cast("double"), lit(1.0))
    val sumLen = aggregate(toks, lit(0L), (acc, w) => acc + length(w))
    val hashes = length(t) - length(regexp_replace(t, "#", ""))
    val ellipses =
      (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3
    val alphaWords = size(filter(toks, w => w.rlike("[A-Za-z]")))
    val stopArr = array(GopherStopwords.map(lit): _*)
    val nStop = size(filter(stopArr, s => array_contains(toks, s)))
      .cast("long")
    val lines = split(t, "\n")
    val nLines = greatest(size(lines).cast("double"), lit(1.0))
    val bulletFrac = round(size(filter(lines, l =>
      l.startsWith("• ") || l.startsWith("- "))).cast("double") / nLines, 4)
    val ellipsisFrac = round(size(filter(lines, l =>
      l.endsWith("..."))).cast("double") / nLines, 4)
    Seq(
      nWords.as("n_words"),
      round(sumLen.cast("double") / nw, 4).as("mean_word_len"),
      round((hashes + ellipses).cast("double") / nw, 4).as("symbol_ratio"),
      round(alphaWords.cast("double") / nw, 4).as("alpha_frac"),
      nStop.as("n_stop"),
      bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"))
  }

  /** The [[gopherFlags]] act step: per-source survival accounting
    * `(source, n_docs, n_kept, kept_id_sum)` — the id sum pins the
    * kept MEMBERSHIP, not just counts. The rules evaluate INLINE in
    * the corpus scan (no self-join) and the only exchange is the
    * bounded per-source map-side-combined aggregate; the corpus text
    * never shuffles. */
  def gopherFilter(
      docs: DataFrame,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minStopwords: Int = 2,
      textCol: String = "text"): DataFrame =
    docs.select(Seq(col("source"), col("doc_id")) ++
        gopherMetricCols(textCol): _*)
      .withColumn("pass",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") <= 0.1 && col("alpha_frac") >= 0.8 &&
          col("n_stop") >= minStopwords && col("bullet_frac") <= 0.9 &&
          col("ellipsis_frac") <= 0.3)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("pass"), col("doc_id")).otherwise(0L))
          .as("kept_id_sum"))
      .orderBy("source")

  /** The kept-corpus arm of the Gopher act step: the input rows (all
    * columns) that pass every rule — the CLI/materialization surface;
    * [[gopherFilter]] is the accounting twin. A single narrow filter,
    * so it pushes into the corpus scan. */
  def gopherKeep(
      docs: DataFrame,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minStopwords: Int = 2,
      textCol: String = "text"): DataFrame = {
    val m = gopherMetricCols(textCol)
    // evaluate the metrics as a struct so the filter stays one
    // expression over the original row (no join, no extra columns)
    val s = struct(m: _*)
    docs.filter(
      s.getField("n_words") >= minWords &&
        s.getField("n_words") <= maxWords &&
        s.getField("mean_word_len") >= 3.0 &&
        s.getField("mean_word_len") <= 10.0 &&
        s.getField("symbol_ratio") <= 0.1 &&
        s.getField("alpha_frac") >= 0.8 &&
        s.getField("n_stop") >= minStopwords &&
        s.getField("bullet_frac") <= 0.9 &&
        s.getField("ellipsis_frac") <= 0.3)
  }

  /** Full per-document text-analysis projection. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      length(t).cast("long").as("n_chars"),
      tokenCount(t).as("n_tokens"),
      stopwordRatio(t).as("stop_ratio"),
      punctRatio(t).as("punct_ratio"),
      qualityScore(t).as("quality"),
      langId(t).as("lang_pred"),
      fingerprint(t).as("fp"))
  }
}
