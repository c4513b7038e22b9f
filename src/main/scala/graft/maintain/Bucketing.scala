package graft.maintain

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout (the co-located-join tool the brief's scale
  * checklist names alongside broadcasting and salting).
  *
  * Writing both fact tables bucketed (and sorted) by the join key
  * pre-shuffles them ONCE at write time; every subsequent join on that
  * key needs no Exchange on either side — at 100 TB this converts the
  * recurring dominant cost of lineitem⋈orders-shaped joins into a
  * one-time layout cost. Bucket counts must match across join sides.
  */
object Bucketing {

  /** Save as a bucketed+sorted managed table (native parquet data
    * source; works on the in-memory catalog, no Hive needed). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int = 32,
      codec: String = "snappy"): Unit =
    df.write
      .mode("overwrite")
      .option("compression", ParquetSinkCodec(codec))
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  private def ParquetSinkCodec(codec: String): String =
    graft.sources.ParquetSink.codecs.getOrElse(codec.toLowerCase,
      throw new IllegalArgumentException(s"unknown codec '$codec'"))
}
