package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, processed in partition-local batches.
  *
  * The decode step is STUBBED (image/audio codecs are not in this
  * container): `decodeStub` derives deterministic fake
  * width/height/duration from the payload hash. Everything around it —
  * the schema, the binary column, the batched per-partition execution
  * shape (the Scala analog of `mapInPandas` batches), partitioning by
  * modality — is real and tested, so swapping in a real codec is a
  * one-function change.
  *
  * The reference only counts attachments (convert_to_iceberg.py:384-396);
  * carrying the payload as a first-class binary column is the extension.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      source_doc: Long)

  final case class DecodedMedia(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      feature: Array[Float])

  /** Build a media table from the documents fixture: payload = UTF-8
    * bytes of the text (a stand-in binary blob with realistic sizes). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      col("doc_id").as("source_doc"))

  /** STUB decode: deterministic fake metadata from the payload hash.
    * Real implementation would decode the codec header here. Runs as a
    * partition-local batch map (Iterator→Iterator — never materializes
    * a partition), the same execution shape a vectorized decode needs. */
  def decodeStub(media: Dataset[MediaRow], featureDim: Int = 8)(
      implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        // ??? real codec goes here; deterministic fake below
        val h = java.util.Arrays.hashCode(m.payload).toLong & 0x7FFFFFFFL
        val feat = Array.tabulate(featureDim)(i =>
          (((h >> (i * 4)) & 0xFF).toFloat / 255f))
        DecodedMedia(
          media_id = m.media_id,
          modality = m.modality,
          n_bytes = m.payload.length.toLong,
          width = (h % 1920).toInt + 1,
          height = (h % 1080).toInt + 1,
          duration_ms = if (m.modality == "image") 0L else (h % 600000L),
          feature = feat)
      }
    }
  }

  /** End-to-end plumbing: media table → typed Dataset → batched decode
    * → per-modality stats. Partitioned by modality before the decode so
    * a real codec's native libs load once per (executor, modality). */
  def decodeAndProfile(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(docs)
      .repartition(col("modality"))
      .as[MediaRow]
    decodeStub(media)
      .groupBy("modality")
      .agg(
        count(lit(1)).as("n_media"),
        round(avg(col("n_bytes")), 2).as("avg_bytes"),
        max(col("width")).as("max_width"))
      .orderBy("modality")
  }
}
