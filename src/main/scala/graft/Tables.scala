package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the synthetic test tables (see /root/repo/TESTDATA.md).
  *
  * Each table is one parquet file per scale factor. Reads are plain
  * `spark.read.parquet` so Catalyst's parquet source handles column
  * pruning and predicate pushdown; callers should keep projections and
  * filters declarative so they reach the scan.
  */
object Tables {
  /** TESTDATA.md lists the TPC-H-ish core; `documents` and
    * `embeddings` also exist at every scale factor (schemas in
    * FIXTURES.md §B) and back the text/dedup/similarity ops. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, path): a DataFrame is an immutable lazy
  // plan, so reuse is safe — and it skips re-listing the path and
  // re-reading parquet footers on every one of the ~50 bench/verify
  // queries (tens of ms each, pure fixed overhead).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong it surfaces as epoch-nanos
    * LongType — convert to a proper timestamp (µs precision; the
    * sub-µs tail is irrelevant for windowing but would silently break
    * every date function if left as a raw long). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      // integral div, NOT `/`: long / long plans a double divide, and
      // ns epochs (~1.7e18) exceed double's 2^53 mantissa — the
      // rounding shifts ~10% of timestamps by ±1 µs vs the oracle's
      // truncating ns→µs cast
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
