package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stripMarkup removes tags, unescapes entities in the safe order") {
    val got = Seq(
      "<div class=\"x\">hello <b>bold</b> world</div>",
      "a &lt;tag&gt; &quot;quoted&quot; isn&#39;t escaped",
      "double-escaped &amp;lt; stays literal",
      "no markup at all",
      null.asInstanceOf[String])
      .toDF("text")
      .select(TextAnalysis.stripMarkup(col("text")).as("c"))
      .as[String].collect().toSeq
    assert(got(0) == "hello bold world")
    assert(got(1) == "a <tag> \"quoted\" isn't escaped")
    // &amp;lt; → literal "&lt;", NOT re-unescaped to "<"
    assert(got(2) == "double-escaped &lt; stays literal")
    assert(got(3) == "no markup at all")
    assert(got(4) == null)
  }

  test("topNgramsBySource: hand counts, tie order, short docs, k cut") {
    val docs = Seq(
      (1L, "a", "x y x y z"),     // bigrams: x y (2), y x (1), y z (1)
      (2L, "a", "x y tail"),      // x y (+1), y tail (1)
      (3L, "a", "solo"),          // 1 token → no bigrams
      (4L, "b", "p q p q")        // p q (2), q p (1)
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.topNgramsBySource(docs, n = 2, k = 2)
      .orderBy("source", "rank")
      .as[(String, String, Long, Int)].collect().toSeq
    // source a: "x y"=3 rank 1; then ties at 1 cut by gram asc →
    // "y tail" < "y x" < "y z": rank 2 = "y tail"
    assert(got == Seq(
      ("a", "x y", 3L, 1),
      ("a", "y tail", 1L, 2),
      ("b", "p q", 2L, 1),
      ("b", "q p", 1L, 2)))
  }

  test("token counting incl. irregular whitespace") {
    val got = Seq("a b  c", " x ", "one", "a\tb\nc d")
      .toDF("t").select(TextAnalysis.tokenCount($"t")).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(3, 1, 1, 4))
  }

  test("bpe-ish token count splits long words and punctuation") {
    val got = Seq("internationalization, yes!")
      .toDF("text").select(TextAnalysis.bpeishTokenCount($"text"))
      .head().getLong(0)
    // intern|atio|nali|zati|on + , + yes + ! = 8
    assert(got == 8)
  }

  test("language id picks the dominant stopword profile") {
    val got = Seq(
      "the cat sat on the mat and it is that good for you",
      "el gato la casa de que y en un los se por la vida",
      "le chat la maison de et les des un une du que bien",
      "der hund die katze und das von zu mit den ein ist hier")
      .toDF("text").select(TextAnalysis.langId($"text")).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("en", "es", "fr", "de"))
  }

  test("quality score bounded and ordered sensibly") {
    val scores = Seq(
      "the quick brown fox jumps over the lazy dog and it is a good day for all of us to be here",
      "@@@ ### !!! $$$ %%% ^^^ &&&")
      .toDF("text").select(TextAnalysis.qualityScore($"text")).collect()
      .map(_.getDouble(0)).toSeq
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores.head > scores.last)
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    val fps = Seq(
      "Hello   World", "hello world", "hello worlds")
      .toDF("t").select(TextAnalysis.fingerprint($"t")).collect()
      .map(_.getLong(0)).toSeq
    assert(fps(0) == fps(1)) // normalization collapses case+spaces
    assert(fps(1) != fps(2)) // content change changes the hash
    assert(fps.forall(f => f >= 0 && f < 2147483647L))
  }

  test("repetition signals against hand-computed values") {
    val out = Seq("a b a b a", "x y z w v", "w").toDF("text")
      .select(
        TextAnalysis.typeTokenRatio($"text").as("ttr"),
        TextAnalysis.topBigramFraction($"text").as("top2"),
        TextAnalysis.dupNgramFraction($"text", 2).as("dup2"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    // "a b a b a": 2 distinct of 5 tokens; bigrams = ab,ba,ab,ba →
    // top 2/4, dup 1 - 2/4
    assert(out(0) == ((0.4, 0.5, 0.5)))
    // all-distinct text: ttr 1, every bigram unique
    assert(out(1) == ((1.0, 0.25, 0.0)))
    // single token: no bigrams at all → both fractions 0
    assert(out(2) == ((1.0, 0.0, 0.0)))
  }

  test("repetition signals are linear-ish in document length") {
    // Canary for the lambda-capture re-evaluation trap: an ngrams/fold
    // formulation that indexes back into the outer token array from
    // inside a HOF lambda re-evaluates the split per element (O(T²)
    // per row; ~minutes for this fixture). The shipped zip_with/fold
    // shape runs it in well under the bound.
    val doc = (1 to 4000).map(i => s"tok${i % 97}").mkString(" ")
    val df = Seq.fill(50)(doc).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .repartition(1) // single task, like Verify's coalesce(1) dump
    val t0 = System.nanoTime()
    val out = df.select(
      TextAnalysis.typeTokenRatio($"text").as("ttr"),
      TextAnalysis.topBigramFraction($"text").as("top2"),
      TextAnalysis.dupNgramFraction($"text", 5).as("dup5"))
      .collect()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.length == 50)
    // 97 distinct tokens of 4000 → heavy repetition on every signal
    assert(out.head.getDouble(0) < 0.05)
    assert(out.head.getDouble(2) > 0.9)
    assert(sec < 60.0, f"repetition signals took $sec%.1f s on 50 wide docs")
  }

  test("normalizeText: case, control chars, and whitespace runs collapse") {
    val got = Seq(
      "  Hello\tWORLD  ",
      "a\u0000b\u0007c", // control chars → spaces → single-space joins
      "already clean",
      "\n\n\n",          // all-whitespace → empty
      "MiXeD   CaSe\r\nLines"
    ).toDF("text")
      .select(TextAnalysis.normalizeText($"text"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "hello world", "a b c", "already clean", "", "mixed case lines"))
  }

  test("PII redaction replaces emails and phones, counts them") {
    val out = Seq("mail bob.smith+x@corp.example.org or 555-123-4567 now",
      "no pii here").toDF("text")
      .select(
        TextAnalysis.redactPii($"text").as("r"),
        TextAnalysis.piiCount($"text", TextAnalysis.EmailRe).as("e"),
        TextAnalysis.piiCount($"text", TextAnalysis.PhoneRe).as("p"))
      .collect()
    assert(out(0).getString(0) == "mail [EMAIL] or [PHONE] now")
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 1L)
    assert(out(1).getString(0) == "no pii here")
    assert(out(1).getLong(1) == 0L && out(1).getLong(2) == 0L)
  }

  test("boilerplate scores: hand-computed shared-shingle stats") {
    // doc1 "a b c d" → shingles {a b c, b c d}
    // doc2 "a b c e" → shingles {a b c, b c e}
    // doc3 "x y z"   → one shingle {x y z}
    // doc4 "hi"      → <3 tokens → whole-text shingle {hi}
    // df: "a b c"=2, everything else 1
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "x y z"), (4L, "hi"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateScores(docs)
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_shared", "max_df", "shared_frac")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 2L, 0.5),
      (2L, 2L, 1L, 2L, 0.5),
      (3L, 1L, 0L, 1L, 0.0),
      (4L, 1L, 0L, 1L, 0.0)))
  }

  test("boilerplate: identical docs share every shingle") {
    val docs = Seq(
      (1L, "copy of the notice text here"),
      (2L, "copy of the notice text here"),
      (3L, "fresh unrelated words only"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateScores(docs)
      .orderBy("doc_id")
      .select("doc_id", "shared_frac", "max_df")
      .as[(Long, Double, Long)].collect()
    assert(got(0)._2 == 1.0 && got(1)._2 == 1.0)
    assert(got(0)._3 == 2L)
    assert(got(2)._2 == 0.0 && got(2)._3 == 1L)
  }

  test("analyze projection over the fixture corpus") {
    val out = TextAnalysis.analyze(
      Tables.documents(spark, TestSpark.sf0001)).cache()
    assert(out.count() == 500)
    assert(out.filter($"n_tokens" <= 0).count() == 0)
    assert(out.filter($"quality" < 0 || $"quality" > 1).count() == 0)
    // fixture text is drawn from an English-ish vocab incl. 'the'
    assert(out.filter($"lang_pred" === "en").count() > 250)
  }

  test("zipfAudit: exact power-law corpus recovers its exponent") {
    // plant freq(token_r) = floor(1000 / r): a corpus whose rank-
    // frequency curve IS a power law with slope −1 (modulo floor)
    val rows = (1 to 20).flatMap { r =>
      Seq.fill(1000 / r)(s"tok$r")
    }.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val docs = rows.toDF("doc_id", "text")
    val got = TextAnalysis.zipfAudit(docs, topK = 20).head()
    assert(got.getAs[Long]("n_distinct_tokens") == 20L)
    assert(got.getAs[Long]("n_fit_points") == 20L)
    val slope = got.getAs[Double]("zipf_slope")
    assert(slope > -1.05 && slope < -0.95, s"slope ≈ −1, got $slope")
    // intercept ≈ ln(1000)/1 ≈ 6.9
    val icept = got.getAs[Double]("zipf_intercept")
    assert(icept > 6.5 && icept < 7.2, s"intercept ≈ ln(1000), got $icept")
  }

  test("zipfAudit: uniform corpus has slope ~0 and honors the topK cut") {
    val docs = (1 to 30).flatMap(i => Seq.fill(5)(s"w$i"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.zipfAudit(docs, topK = 10).head()
    assert(got.getAs[Long]("n_distinct_tokens") == 30L)
    assert(got.getAs[Long]("n_fit_points") == 10L, "limit respected")
    assert(got.getAs[Double]("zipf_slope") == 0.0,
      "equal frequencies fit a flat line exactly")
  }

  test("corpusCard: one-row release summary with exact fields") {
    val docs = Seq(
      (1L, "aa bb cc", "en"),
      (2L, "aa bb cc", "en"),   // exact dup of 1
      (3L, "dd ee", "de")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.corpusCard(docs).head()
    assert(got.getAs[Long]("n_docs") == 3L)
    assert(got.getAs[Long]("n_tokens") == 8L)
    assert(got.getAs[Long]("n_chars") == 21L)
    assert(got.getAs[Long]("n_distinct_docs") == 2L)
    assert(got.getAs[Double]("exact_dup_rate") == 0.3333)
    assert(got.getAs[Long]("n_langs") == 2L)
    // entropy of (2/3, 1/3) = ln3 - (2/3)ln2 ≈ 0.6365
    assert(math.abs(got.getAs[Double]("lang_entropy") - 0.6365) < 1e-4)
    assert(got.getAs[Double]("avg_tokens_per_doc") == 2.6667)
  }

  test("tokenizerFertility: per-language chars-per-token") {
    val docs = Seq(
      (1L, "aa bb cc", "en"),   // 8 chars, 3 tokens
      (2L, "dddd eeee", "en"),  // 9 chars, 2 tokens
      (3L, "xxxxxxxxxx", "zh")  // 10 chars, 1 token
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.tokenizerFertility(docs)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("en", 2L, 17L, 5L, 3.4),
      ("zh", 1L, 10L, 1L, 10.0)), got.toString)
  }

  test("winnowing: a shared (k+w-1)-token run guarantees a shared fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 = k+w-1
    val docs = Seq(
      (1L, "one two " + shared + " three"),
      (2L, shared + " nine ten eleven"),
      (3L, "totally different words entirely present here now")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, k = 4, w = 4)
      .as[(Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> r._3.toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "the winnowing guarantee: >= k+w-1 shared tokens -> shared fp")
    assert((fps(1L) & fps(3L)).isEmpty)
  }

  test("winnowing minima match a hand recomputation") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(docs, k = 2, w = 2)
      .as[(Long, Long, Seq[Long])].head()
    // k=2 grams: "a b","b c","c d","e f"... 5 grams; w=2 -> 4 minima
    val hs = Seq("a b", "b c", "c d", "d e", "e f")
      .map(graft.functions.TextHash.roll)
    val want = hs.sliding(2).map(_.min).toSeq.distinct.sorted
    assert(got._2 == 5L)
    assert(got._3 == want, s"got ${got._3} want $want")
  }

  test("winnowPairs finds the planted copy and nothing else") {
    val span = "pp qq rr ss tt uu vv" // 7 tokens = k+w-1
    val docs = Seq(
      (1L, "xx yy " + span),
      (2L, span + " zz ww"),
      (3L, "unrelated totally different content right here")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(docs, k = 4, w = 4, minShared = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), pairs.toString)
  }

  test("gopherFlags: hand-computed rule surface, one failing rule each") {
    val docs = Seq(
      (1L, "the cat sat with the dog"),  // all rules pass
      (2L, "tiny doc"),                  // r_words + r_stop fail
      (3L, "the data #x# #y# with tags"),// r_symbol fails (4/6 > 0.1)
      (4L, "a b c d e"),                 // r_wordlen (mean 1) + r_stop
      (5L, "• x\n• y\n• z"),             // r_bullet (3/3 > 0.9)
      (6L, "the story ends with this...")// r_ellipsis untripped: 1 line
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFlags(docs, minWords = 3)
      .orderBy("doc_id").collect()
    def flags(i: Int, name: String): Boolean =
      got(i).getAs[Boolean](name)
    // doc 1: 6 words, mean (3+3+3+4+3+3)/6 = 3.1667, stops {the, with}
    assert(got(0).getAs[Long]("n_words") == 6L)
    assert(got(0).getAs[Double]("mean_word_len") == 3.1667)
    assert(got(0).getAs[Long]("n_stop") == 2L)
    assert(flags(0, "pass"))
    // doc 2: 2 words < 3
    assert(!flags(1, "r_words") && !flags(1, "r_stop") && !flags(1, "pass"))
    // doc 3: 4 '#' over 6 words = 0.6667
    assert(got(2).getAs[Double]("symbol_ratio") == 0.6667)
    assert(!flags(2, "r_symbol") && flags(2, "r_stop") && !flags(2, "pass"))
    // doc 4: mean word length 1
    assert(!flags(3, "r_wordlen") && !flags(3, "pass"))
    // doc 5: every line bullet-led
    assert(got(4).getAs[Double]("bullet_frac") == 1.0)
    assert(!flags(4, "r_bullet") && !flags(4, "pass"))
    // doc 6: single line ends '...' → frac 1.0 > 0.3 → fails; and the
    // '...' also counts as a symbol: 1 over 5 words = 0.2 > 0.1
    assert(got(5).getAs[Double]("symbol_ratio") == 0.2)
    assert(!flags(5, "r_ellipsis") && !flags(5, "pass"))
  }

  test("gopherFilter: per-source survival with id-sum membership") {
    val docs = Seq(
      (1L, "the cat sat with the dog", "s1"),
      (2L, "tiny doc", "s1"),
      (3L, "the dog ran with the cat", "s2")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.gopherFilter(docs, minWords = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("s1", 2L, 1L, 1L), ("s2", 1L, 1L, 3L)), got)
  }
}
