package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring — the deterministic stand-in
  * for the perplexity filter training-data pipelines run (a real LM
  * isn't in this container; the *pipeline shape* is identical): learn
  * token frequencies from the corpus, score each document by its
  * average token log-probability, drop the tail.
  *
  * Scale design: the model is the top-`vocabSize` tokens — bounded by
  * construction, so it broadcasts no matter how large the corpus is;
  * everything below the cut scores at a floor probability
  * (`0.5 / total_tokens`, OOV included). Learning is one map-side-
  * combined groupBy over exploded tokens; scoring re-explodes and
  * probes the broadcast vocab — no fact-fact shuffle anywhere. The
  * vocab cut is ordered `(count DESC, token ASC)`, so membership is
  * deterministic even across tied counts and an oracle can recompute
  * it exactly.
  */
object LanguageModel {

  /** `(token, cnt)` for the `vocabSize` most frequent lowercased
    * whitespace tokens; ties broken lexicographically. */
  def vocab(
      docs: DataFrame,
      textCol: String = "text",
      vocabSize: Int = 1000): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    docs
      .select(explode(
        TextAnalysis.tokens(lower(coalesce(col(textCol), lit("")))))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(vocabSize)
  }

  /** Per-document unigram score: `(idCol, n_tokens, avg_logprob)`
    * (join back on `idCol` to recover document columns) where
    * `avg_logprob` is the mean of `ln(cnt / total)` over the
    * document's tokens, with tokens outside the top-`vocabSize` vocab
    * floored at `ln(0.5 / total)`. `total` counts ALL corpus tokens
    * (not only in-vocab), so scores are comparable across vocab
    * sizes. */
  def scoreUnigram(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      vocabSize: Int = 1000): DataFrame = {
    val toks = docs.select(
      col(idCol),
      explode(TextAnalysis.tokens(lower(coalesce(col(textCol), lit("")))))
        .as("token"))
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    // persisted: `counts` (distinct tokens — small next to the corpus)
    // feeds two independent broadcast subplans (the total and the
    // top-K cut); unpersisted, Catalyst inlines the exploded groupBy
    // into each, so the full corpus tokenize+shuffle would run twice.
    // Learning is then ONE pass over the corpus; scoring below is the
    // second, inherent pass. persistIfNew (not a bare persist): a
    // reconstructed identical plan — a warm bench pass, a re-derived
    // model — reuses the live cache instead of logging CacheManager
    // "already cached" noise. (Same pattern as Dedup.nearDupMinhash's
    // shared shingle frame.)
    val counts = Dedup.persistIfNew(
      toks.groupBy("token").agg(count(lit(1)).as("cnt")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)._1
    val total = counts.agg(sum(col("cnt")).as("total_tokens"))
    val v = counts.orderBy(col("cnt").desc, col("token")).limit(vocabSize)
    toks
      .join(broadcast(v), Seq("token"), "left")
      .crossJoin(broadcast(total))
      .select(
        col(idCol),
        log(coalesce(col("cnt").cast("double"), lit(0.5)) /
          col("total_tokens")).as("logp"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        avg(col("logp")).as("avg_logprob"))
  }

  /** BPE tokenizer-training prep: the FIRST merge iteration's
    * candidate table — adjacent character-pair counts weighted by
    * word frequency (`count(pair) = Σ_{words containing pair}
    * wordFreq`), which is exactly what byte-pair encoding greedily
    * merges. Iterating merges is sequential by nature; the expensive,
    * distributable part is this corpus-wide pair count, and each
    * subsequent iteration is the same plan over re-segmented words.
    *
    * Scale: one exploded word count (map-side combined; the word
    * vocabulary, not the corpus, flows into the second stage), then a
    * char-pair explode over the VOCAB ONLY — corpus size stops
    * mattering after the first aggregate. Single-char words carry no
    * pairs and are filtered before the explode. */
  def bpeMergePairs(
      docs: DataFrame,
      textCol: String = "text",
      topK: Int = 20): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val words = docs.select(
      explode(TextAnalysis.tokens(lower(coalesce(col(textCol), lit("")))))
        .as("word"))
    val freq = words.groupBy("word").agg(count(lit(1)).as("wfreq"))
      .filter(length(col("word")) >= 2)
    val chars = split(col("word"), "")
    freq
      .select(col("wfreq"),
        explode(transform(
          sequence(lit(0), length(col("word")) - 2),
          i => concat(element_at(chars, i + 1), element_at(chars, i + 2))))
          .as("pair"))
      .groupBy("pair").agg(sum(col("wfreq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(topK)
  }

  /** Per-source tokenizer-coverage audit: token count, OOV count, and
    * OOV rate against the corpus top-`vocabSize` vocab — the fit
    * check run before committing to a vocab (a source whose OOV rate
    * is an outlier will tokenize into fragments and dominate the
    * token budget). The vocab is bounded by construction → broadcast;
    * the probe side explodes narrowly and collapses in a map-side-
    * combined per-source aggregate — no fact-fact shuffle. */
  def oovRateBySource(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text",
      vocabSize: Int = 1000): DataFrame = {
    val v = vocab(docs, textCol, vocabSize)
      .select(col("token"), lit(1).as("__in_v"))
    docs
      .select(col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(
          lower(coalesce(col(textCol), lit(""))))).as("token"))
      .join(broadcast(v), Seq("token"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("__in_v").isNull, true)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 4))
      .orderBy("source")
  }

  /** Top-`nMerges` BPE merges with the pair kept as (left, right) —
    * the application-ready form of [[bpeMergePairs]] (which
    * concatenates the pair for reporting and can alias e.g.
    * ("a","bc")/("ab","c")). Frequency-weighted over the word vocab,
    * deterministic (cnt DESC, left, right) order. */
  def bpeTopMerges(
      docs: DataFrame,
      textCol: String = "text",
      nMerges: Int = 3): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    val freq = docs
      .select(explode(TextAnalysis.tokens(
        lower(coalesce(col(textCol), lit(""))))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wfreq"))
      .filter(length(col("word")) >= 2)
    val chars = split(col("word"), "")
    freq
      .select(col("wfreq"),
        explode(transform(
          sequence(lit(0), length(col("word")) - 2),
          i => struct(
            element_at(chars, i + 1).as("left"),
            element_at(chars, i + 2).as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("wfreq")).as("cnt"))
      .orderBy(col("cnt").desc, col("left"), col("right"))
      .limit(nMerges)
  }

  /** Apply the corpus-learned top-`nMerges` BPE merges to every
    * document and count subwords before/after — the tokenizer
    * APPLICATION step that closes the learn→apply loop (the merges
    * come from one statistics pass, applied simultaneously — the
    * deterministic one-iteration variant; a full trainer would
    * recount between iterations).
    *
    * A word is encoded as the space-separated char sequence
    * `" a b c "`; merge (a,b) is `replace(" a b ", " ab ")` — plain
    * leftmost non-overlapping string replacement, identical semantics
    * in Spark and any SQL oracle (adjacent occurrences share a
    * boundary space, so alternate ones merge — same both sides by
    * construction). Merges arrive pre-ordered in ONE broadcast row
    * (sort_array over (−cnt, left, right) structs — no global-rank
    * window, no extra exchange); the per-word fold is a fixed
    * `nMerges`-deep codegen replace chain, so the whole encode is
    * scan → broadcast probe → map-side-combined per-doc aggregate. */
  def bpeEncodeCounts(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      nMerges: Int = 3): DataFrame = {
    val mArr = bpeTopMerges(docs, textCol, nMerges)
      .agg(sort_array(collect_list(struct(
        (-col("cnt")).as("nc"), col("left"), col("right")))).as("ms"))
    val seq0 = concat(lit(" "),
      regexp_replace(col("word"), "(.)", "$1 "))
    val encoded = (1 to nMerges).foldLeft(seq0) { (acc, i) =>
      val m = element_at(col("ms"), i)
      when(lit(i) <= size(col("ms")),
        replace(acc,
          concat(lit(" "), m.getField("left"), lit(" "),
            m.getField("right"), lit(" ")),
          concat(lit(" "), m.getField("left"),
            m.getField("right"), lit(" "))))
        .otherwise(acc)
    }
    docs
      .select(col(idCol),
        explode(TextAnalysis.tokens(
          lower(coalesce(col(textCol), lit(""))))).as("word"))
      .crossJoin(broadcast(mArr))
      .select(col(idCol), length(col("word")).cast("long").as("n_chars"),
        size(split(trim(encoded), " ")).cast("long").as("n_sub"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_chars")).as("n_sub_before"),
        sum(col("n_sub")).as("n_sub_after"))
  }

  /** Per-document interpolated bigram score: `(idCol, n_bigrams,
    * avg_logprob)` — the next rung up the perplexity-filter ladder
    * from [[scoreUnigram]]. Each adjacent token pair `(w1, w2)`
    * contributes `ln(λ·P(w2|w1) + (1-λ)·Pu(w2))`:
    * `P(w2|w1) = bigram_cnt / cnt(w1)` when the bigram is in the
    * top-`bigramVocabSize` bigram vocab AND `w1` in the top-
    * `vocabSize` unigram vocab (0 otherwise — the interpolation backs
    * off to the unigram term), `Pu(w2) = cnt(w2)/total` with the
    * [[scoreUnigram]] OOV floor (`0.5/total`). `λ < 1` keeps the
    * argument strictly positive. Documents with fewer than two tokens
    * emit no bigrams and are absent from the result.
    *
    * Scale: both models are top-K cuts — bounded by construction, so
    * they broadcast at any corpus size; bigram pairs are built with
    * array algebra (`sequence`→`transform`→`explode`, zero UDFs,
    * whole-stage codegen). Learning is one map-side-combined agg per
    * model; scoring probes three broadcast maps — no fact-fact
    * shuffle. Like [[scoreUnigram]], the corpus is scanned once to
    * learn and once to score; tie-breaks (`cnt DESC, token` /
    * `bcnt DESC, w1, w2`) make both cuts exactly reproducible. */
  def scoreBigram(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      vocabSize: Int = 1000,
      bigramVocabSize: Int = 2000,
      lambda: Double = 0.7): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    require(bigramVocabSize > 0,
      s"bigramVocabSize must be positive: $bigramVocabSize")
    require(lambda >= 0 && lambda < 1,
      s"lambda must be in [0, 1) so the log argument stays positive: $lambda")
    val toksArr = TextAnalysis.tokens(lower(coalesce(col(textCol), lit(""))))
    val base = docs.select(col(idCol), toksArr.as("__graft_toks"))
    val toks = base.select(
      col(idCol), explode(col("__graft_toks")).as("token"))
    // persisted for the same reason (and with the same persistIfNew
    // reuse guard) as scoreUnigram: the token-counts frame feeds both
    // the total and the top-K cut
    val counts = Dedup.persistIfNew(
      toks.groupBy("token").agg(count(lit(1)).as("cnt")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)._1
    val total = counts.agg(sum(col("cnt")).as("total_tokens"))
    val uni = counts.orderBy(col("cnt").desc, col("token")).limit(vocabSize)
    val pairs = base
      .filter(size(col("__graft_toks")) >= 2)
      .select(col(idCol),
        explode(transform(
          sequence(lit(0), size(col("__graft_toks")) - 2),
          i => struct(
            element_at(col("__graft_toks"), i + 1).as("w1"),
            element_at(col("__graft_toks"), i + 2).as("w2"))))
          .as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bc = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("bcnt"))
      .orderBy(col("bcnt").desc, col("w1"), col("w2"))
      .limit(bigramVocabSize)
    pairs
      .join(broadcast(bc), Seq("w1", "w2"), "left")
      .join(broadcast(
        uni.select(col("token").as("w1"), col("cnt").as("cnt1"))),
        Seq("w1"), "left")
      .join(broadcast(
        uni.select(col("token").as("w2"), col("cnt").as("cnt2"))),
        Seq("w2"), "left")
      .crossJoin(broadcast(total))
      .select(col(idCol),
        log(
          lit(lambda) * coalesce(
            col("bcnt").cast("double") / col("cnt1").cast("double"),
            lit(0.0)) +
          lit(1.0 - lambda) * (coalesce(col("cnt2").cast("double"),
            lit(0.5)) / col("total_tokens").cast("double")))
          .as("logp"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        avg(col("logp")).as("avg_logprob"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    * every document with the interpolated bigram LM
    * ([[scoreBigram]]), split the corpus into head / middle / tail
    * terciles of LM score (head = highest log-prob = lowest
    * perplexity = cleanest), and return per-document
    * `(idCol, si, bucket)` where `si` is the INTEGER score surrogate
    * `round(avg_logprob·10⁴, 0)` — the round-to-0-places result is an
    * exactly-integer-valued double in BOTH engines (unlike
    * `round(x,4)·10⁴`, whose product can sit 1 ulp under the integer
    * and truncate differently across engines), so every downstream
    * comparison is integer-vs-threshold and bucket membership is
    * deterministic and oracle-reproducible bit for bit.
    *
    * Determinism: tercile thresholds are the exact interpolated
    * percentiles of the INTEGER surrogates (both engines interpolate
    * the same rank formula over identical integers → identical
    * doubles). Docs with < 2 tokens have no bigrams and are not
    * scored — same contract as [[scoreBigram]].
    *
    * Scale shape: the LM scoring is [[scoreBigram]]'s broadcast plan;
    * the thresholds are ONE extra bounded aggregate — and because the
    * percentile runs on the 4-dp integer surrogate, its exact-
    * percentile buffer is bounded by the number of DISTINCT rounded
    * scores (a value-count map, not the corpus), so the exact path
    * survives scale where raw-double `percentile` would not (compare
    * the a18 caveat). Thresholds broadcast; the bucket label is a
    * narrow per-row comparison. */
  def pplBuckets(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      vocabSize: Int = 1000,
      bigramVocabSize: Int = 2000,
      lambda: Double = 0.7): DataFrame = {
    // the scored (id, si) frame feeds BOTH the tercile thresholds and
    // the bucketing projection — materialize it once (the winnowPairs
    // barrier pattern) so the scoreBigram subtree (two vocab
    // order-limit passes + the LM joins) doesn't run twice
    val scored = scoreBigram(docs, idCol, textCol, vocabSize,
      bigramVocabSize, lambda)
      .select(col(idCol),
        round(col("avg_logprob") * 10000, 0).cast("long").as("si"))
      .localCheckpoint(true)
    val thr = scored.agg(
      expr("percentile(si, 1.0/3.0)").as("t1"),
      expr("percentile(si, 2.0/3.0)").as("t2"))
    scored.crossJoin(broadcast(thr))
      .select(col(idCol), col("si"),
        when(col("si") >= col("t2"), lit("head"))
          .when(col("si") >= col("t1"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** The [[pplBuckets]] act step: drop the documents whose bucket is
    * NOT in `keepBuckets` (CCNet keeps head+middle and discards the
    * noisiest tail third). Documents with < 2 tokens have no bigrams,
    * get no score and no bucket ([[scoreBigram]]'s contract) — they
    * PASS THROUGH: the act step drops docs affirmatively labeled
    * noisy, never docs the LM produced no evidence about (dropping
    * them silently would be data loss dressed as filtering; a caller
    * that wants them gone filters on token count explicitly).
    * Implemented as an anti-join on the dropped-bucket ids, so the
    * pass-through is structural, not a special case. Returns the
    * input rows (all columns) that survive — one broadcast-threshold
    * comparison per scored row, the corpus never shuffles. */
  def pplKeep(
      docs: DataFrame,
      keepBuckets: Seq[String] = Seq("head", "middle"),
      idCol: String = "doc_id",
      textCol: String = "text",
      vocabSize: Int = 1000,
      bigramVocabSize: Int = 2000,
      lambda: Double = 0.7): DataFrame = {
    val dropped = pplBuckets(docs, idCol, textCol, vocabSize,
      bigramVocabSize, lambda)
      .filter(!col("bucket").isin(keepBuckets: _*))
      .select(col(idCol))
    docs.join(dropped, Seq(idCol), "left_anti")
  }
}
