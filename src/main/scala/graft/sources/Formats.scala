package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Uniform multi-format table IO. The reference is JSON-in /
  * parquet-out only; a Spark-native engine gets every columnar and
  * text format from the same DataFrameReader/Writer surface — exposed
  * here as one API so the CLI and library callers don't special-case.
  *
  * Format choice at 100 TB: parquet/orc (columnar, predicate pushdown,
  * codec per column) for analytics tables; json/csv only as ingest or
  * interchange formats — both scan-everything row formats.
  */
object Formats {

  // avro excluded: the spark-avro datasource jar isn't bundled in
  // this distro (only avro core libs)
  val supported: Set[String] = Set("parquet", "orc", "json", "csv")

  def write(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      codec: String = "snappy",
      partitionCols: Seq[String] = Seq.empty): Unit = {
    require(supported.contains(format), s"unsupported format: $format")
    val w = df.write.mode("overwrite").format(format)
    val withOpts = format match {
      case "csv" => w.option("header", "true").option("compression", codec)
      case "json" => w.option("compression", codec)
      case _ => w.option("compression",
        ParquetSink.codecs.getOrElse(codec.toLowerCase, codec))
    }
    (if (partitionCols.nonEmpty) withOpts.partitionBy(partitionCols: _*)
     else withOpts).save(path)
  }

  /** CSV ingest with the same corrupt-row quarantine contract as the
    * JSON:API reader (JsonApi.readRaw): PERMISSIVE parse, malformed
    * lines land in `_corrupt_record` instead of aborting the job —
    * a single bad row in a 100 TB feed must never kill the run.
    * `schema` is the DATA schema; the corrupt column is appended here. */
  def readCsvQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  /** Schema-explicit read (schema required for the row formats so a
    * round-trip preserves types; columnar formats embed theirs). */
  def read(
      spark: SparkSession,
      path: String,
      format: String = "parquet",
      schema: Option[StructType] = None): DataFrame = {
    require(supported.contains(format), s"unsupported format: $format")
    val r = spark.read.format(format)
    val withSchema = schema.map(r.schema).getOrElse(r)
    val withOpts = format match {
      case "csv" => withSchema.option("header", "true")
      case _ => withSchema
    }
    withOpts.load(path)
  }
}
