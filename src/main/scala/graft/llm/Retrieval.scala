package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextHash}

/** BM25 retrieval scoring over a document corpus — the lexical search
  * primitive a training-data pipeline uses for targeted corpus probes
  * (find documents about X, score benchmark leakage candidates, build
  * retrieval baselines).
  *
  * Lucene-flavored BM25: `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`,
  * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`.
  *
  * Scale shape: two narrow scans of the corpus (one global length
  * aggregate for `N`/`avgdl`, one tokenize pass) — the `isin(query)`
  * filter drops non-matching tokens BEFORE any exchange, so only
  * `(doc, query-term)` rows ever shuffle (bounded by |query| · N, in
  * practice a sliver of the corpus). Document frequencies are |query|
  * rows, broadcast; the final top-k is a `TakeOrderedAndProject`, never
  * a global sort. No inverted index is materialized — at 100 TB the
  * index build would itself be the dominant cost, and a scan-time score
  * fuses with whatever filter/projection precedes it.
  */
object Retrieval {

  /** All documents matching ≥1 query term, scored:
    * `(idCol, n_terms_hit, bm25)` — bm25 rounded to 4 decimals so the
    * cross-engine summation-order noise in the last ulp cannot leak
    * into results. */
  def bm25Scores(
      docs: DataFrame,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val toks = TextAnalysis.tokens(lower(coalesce(col(textCol), lit(""))))
    val withLen = docs
      .select(col(idCol), toks.as("__graft_toks"))
      .select(col(idCol), col("__graft_toks"),
        size(col("__graft_toks")).cast("long").as("dl"))
    val stats = withLen.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    val tf = withLen
      .select(col(idCol), col("dl"),
        explode(col("__graft_toks")).as("token"))
      .filter(col("token").isin(queryTerms: _*))
      .groupBy(col(idCol), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) +
          (col("n_docs").cast("double") - col("df").cast("double") +
            lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("term_score",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_terms_hit"),
        round(sum(col("term_score")), 4).as("bm25"))
  }

  /** Deterministic hash-bucket embedding: lowercased whitespace
    * tokens hashed into `dims` count buckets (`v[j] = #{t :
    * text_hash(t) mod dims = j}`, as doubles). This is the
    * feature-hashing ("hashing trick") text vectorizer — a real model
    * would replace it, but the Spark-side plumbing (array algebra,
    * codegen hash, broadcast query vector, cosine top-k) is exactly
    * what a learned embedding flows through, and unlike one it is
    * reproducible on any engine, so retrieval results can be
    * oracle-checked end to end. Pure column algebra (`transform` /
    * `filter` / `size`), O(dims · tokens) per row, zero UDFs. */
  def hashEmbed(text: Column, dims: Int = 16): Column =
    hashEmbedTokens(TextAnalysis.tokens(coalesce(text, lit(""))), dims)

  /** [[hashEmbed]] over an already-tokenized column — for callers that
    * hold the token array (chunking's `keepTokens`): skips the
    * join-to-text + regex re-split round-trip. Identical vectors:
    * whitespace token boundaries are case-independent, so lowercasing
    * per token ≡ tokenizing the lowercased text. */
  def hashEmbedTokens(toks: Column, dims: Int = 16): Column = {
    require(dims > 0, s"dims must be positive: $dims")
    val hashes = transform(toks,
      t => pmod(TextHash.text_hash(lower(t)), lit(dims.toLong)))
    transform(sequence(lit(0), lit(dims - 1)),
      j => size(filter(hashes, h => h === j)).cast("double"))
  }

  /** Composed RAG retrieval: chunk the corpus
    * ([[Chunking.chunk]], fixed windows) → [[hashEmbed]] each chunk →
    * cosine top-k against the embedded query string. ONE lazy plan:
    * chunking and embedding are narrow projections fused into the
    * scan, the query vector is a broadcast one-row frame, and the
    * top-k is a `TakeOrderedAndProject` — the only exchange in the
    * whole pipeline. Returns `(doc_id, chunk_idx, cos_sim)`;
    * ties break (cos_sim desc, doc_id, chunk_idx). */
  def ragRetrieve(
      docs: DataFrame,
      queryText: String,
      k: Int = 10,
      dims: Int = 16,
      chunkSize: Int = 32,
      overlap: Int = 0,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val spark = docs.sparkSession
    GraftFunctions.register(spark)
    val chunks = Chunking
      .chunk(docs, textCol = textCol, chunkSize = chunkSize,
        overlap = overlap, keepTokens = true)
      .select(col(idCol), col("chunk_idx"),
        hashEmbedTokens(col("chunk_tokens"), dims).as("__graft_v"))
    val query = spark.range(1)
      .select(hashEmbed(lit(queryText), dims).as("__graft_q"))
    chunks
      .crossJoin(broadcast(query))
      .select(col(idCol), col("chunk_idx"),
        round(Similarity.cosine(col("__graft_v"), col("__graft_q")), 4)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol), col("chunk_idx"))
      .limit(k)
  }

  /** Top-k by BM25, ties broken by id — a `TakeOrderedAndProject`
    * (per-partition heap + driver merge), never a global sort. */
  def bm25TopK(
      docs: DataFrame,
      queryTerms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    bm25Scores(docs, queryTerms, k1, b, idCol, textCol)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }
}
