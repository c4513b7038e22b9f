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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

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
      raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
