package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Three tiers, in ascending scale:
  *  - `bruteForceTopK`: exact cosine against every vector; the scan is
  *    distributed and the top-k is a TakeOrderedAndProject (bounded
  *    heap per partition, k rows to the driver) — correct baseline and
  *    the verifier for the approximate tiers;
  *  - `lshBucketTopK`: random-hyperplane LSH — vectors bucketed by the
  *    sign pattern of `nBits` fixed projections; a query probes only
  *    its own bucket plus Hamming≤1 neighbors (nBits+1 buckets of 2^nBits),
  *    cutting the scanned fraction to ~(nBits+1)/2^nBits;
  *  - `ivfTopK`: IVF-lite — a deterministic sample of vectors acts as
  *    the coarse centroid table (broadcast), every vector is assigned
  *    to its nearest centroid (one broadcast join, no shuffle of the
  *    big side), and a query probes the `nprobe` nearest lists.
  *
  * All dot products run in double precision via zip_with + aggregate —
  * pure Catalyst higher-order functions, no UDF, no collect.
  */
object Similarity {

  /** Dot product of two array<numeric> columns, accumulated in double
    * left-to-right (bitwise-reproducible across engines). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k by cosine against a single query vector (given as the
    * one-row DataFrame `query(q_vec)`), excluding `excludeId`. */
  def bruteForceTopK(
      embeddings: DataFrame,
      query: DataFrame,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      excludeId: Long = -1L): DataFrame =
    embeddings
      .filter(col(idCol) =!= excludeId)
      .crossJoin(broadcast(query))
      .select(
        col(idCol),
        round(cosine(col(vecCol), col("q_vec")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)

  /** Sign-bit bucket id for random-hyperplane LSH. The "hyperplanes"
    * are deterministic pseudo-random unit-free vectors derived from
    * xxhash64(dim, bit) — fixed across executors with no RNG state. */
  def lshBucket(vec: Column, dim: Int, nBits: Int = 8): Column = {
    val bits = (0 until nBits).map { bit =>
      // projection_b(v) = sum_i v[i] * h(i,b), h in [-1,1]
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast("double") *
            (pmod(xxhash64(i, lit(bit)), lit(2000001L)).cast("double") /
              lit(1000000.0) - lit(1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << bit)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b).cast("long")
  }

  /** Approximate top-k: probe the query's bucket and all Hamming-1
    * neighbor buckets. Output schema matches bruteForceTopK. */
  def lshBucketTopK(
      embeddings: DataFrame,
      query: DataFrame,
      dim: Int,
      k: Int = 10,
      nBits: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      excludeId: Long = -1L): DataFrame = {
    val bucketed = embeddings
      .filter(col(idCol) =!= excludeId)
      .withColumn("bucket", lshBucket(col(vecCol), dim, nBits))
    val q = query.withColumn("q_bucket", lshBucket(col("q_vec"), dim, nBits))
      .withColumn("probe",
        explode(array(
          col("q_bucket") +:
            (0 until nBits).map(b =>
              col("q_bucket").bitwiseXOR(lit(1L << b))): _*)))
      .select(col("q_vec"), col("probe"))
    bucketed
      .join(broadcast(q), col("bucket") === col("probe"))
      .select(col(idCol),
        round(cosine(col(vecCol), col("q_vec")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF-lite index: centroids = deterministic sample (id % step == 0),
    * broadcast; assignment = argmin over centroid dots (per-row loop
    * over a broadcast array, no shuffle). Returns the embeddings table
    * with a `list_id` column — the materialized "index". */
  def ivfAssign(
      embeddings: DataFrame,
      nlist: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val centroids = embeddings
      .orderBy(col(idCol))
      .limit(nlist)
      .select(col(idCol).as("list_id"), col(vecCol).as("c_vec"))
    val cArr = centroids.agg(
      collect_list(struct(col("list_id"), col("c_vec"))).as("cs"))
    embeddings
      .crossJoin(broadcast(cArr))
      .withColumn("best",
        array_max(transform(col("cs"), c =>
          struct(
            cosine(col(vecCol), c.getField("c_vec")).as("sim"),
            c.getField("list_id").as("list_id")))))
      .select(col(idCol), col(vecCol), col("best.list_id").as("list_id"))
  }

  /** Query the IVF index: rank centroids by query similarity, scan only
    * the nprobe best lists. */
  def ivfTopK(
      indexed: DataFrame,
      query: DataFrame,
      k: Int = 10,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      excludeId: Long = -1L): DataFrame = {
    val centroids = indexed
      .groupBy("list_id")
      .agg(first(col(vecCol)).as("c_vec"))
    val probeLists = centroids
      .crossJoin(broadcast(query))
      .select(col("list_id"), cosine(col("c_vec"), col("q_vec")).as("c_sim"))
      .orderBy(col("c_sim").desc)
      .limit(nprobe)
      .select("list_id")
    indexed
      .filter(col(idCol) =!= excludeId)
      .join(broadcast(probeLists), Seq("list_id"))
      .crossJoin(broadcast(query))
      .select(col(idCol),
        round(cosine(col(vecCol), col("q_vec")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs at scale: LSH-bucket both
    * sides, pair only within buckets, verify with exact cosine. */
  def nearDupCosine(
      embeddings: DataFrame,
      dim: Int,
      minCosine: Double = 0.95,
      nBits: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val bucketed = embeddings.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), dim, nBits).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
      .distinct()
  }
}
