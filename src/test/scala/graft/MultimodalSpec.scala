package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binary media plumbing: schema, batch decode, per-modality stats") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.count() == 500)

    val decoded = Multimodal.decode(
      media.repartition(4).as[Multimodal.MediaRow]).cache()
    assert(decoded.count() == 500)
    val row = decoded.filter($"media_id" === 0L).head()
    assert(row.n_bytes > 0)
    assert(row.feature.length == 8)
    assert(row.width >= 1 && row.height >= 1)
    // images carry no duration; av media may
    assert(decoded.filter($"modality" === "image")
      .filter($"duration_ms" =!= 0L).count() == 0)

    val profile = Multimodal.decodeAndProfile(docs).collect()
    assert(profile.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(profile.forall(_.getAs[Long]("n_media") > 100))
  }

  test("decode is deterministic (stable fallback for non-media payloads)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(50)
    val m = Multimodal.mediaFromDocuments(docs).as[Multimodal.MediaRow]
    val a = Multimodal.decode(m).orderBy("media_id")
      .select("width", "height").as[(Int, Int)].collect().toSeq
    val b = Multimodal.decode(m).orderBy("media_id")
      .select("width", "height").as[(Int, Int)].collect().toSeq
    assert(a == b)
  }

  // -- real header decodes ------------------------------------------

  /** Minimal valid-enough PNG: signature + IHDR(640×480). */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    def be(i: Int) = Array((i >> 24).toByte, (i >> 16).toByte,
      (i >> 8).toByte, i.toByte)
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      be(13) ++ "IHDR".getBytes ++ be(w) ++ be(h) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be(0) // bit depth..interlace + CRC
  }

  /** Canonical 44-byte WAV header: byteRate 16000, data 32000 → 2000ms. */
  private def wavBytes(byteRate: Int, dataBytes: Int): Array[Byte] = {
    def le(i: Int) = Array(i.toByte, (i >> 8).toByte,
      (i >> 16).toByte, (i >> 24).toByte)
    def le16(i: Int) = Array(i.toByte, (i >> 8).toByte)
    "RIFF".getBytes ++ le(36 + dataBytes) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le(16) ++ le16(1) ++ le16(1) ++
      le(byteRate / 2) ++ le(byteRate) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le(dataBytes)
  }

  test("PNG IHDR and WAV duration decode from real header bytes") {
    import Multimodal.MediaHeaders
    assert(MediaHeaders.pngDimensions(pngBytes(640, 480)) === Some((640, 480)))
    assert(MediaHeaders.pngDimensions(pngBytes(1, 1)) === Some((1, 1)))
    assert(MediaHeaders.pngDimensions("not a png at all".getBytes) === None)
    assert(MediaHeaders.pngDimensions(Array.emptyByteArray) === None)
    assert(MediaHeaders.wavDurationMs(wavBytes(16000, 32000)) === Some(2000L))
    assert(MediaHeaders.wavDurationMs(wavBytes(44100 * 2, 44100 * 2)) === Some(1000L))
    assert(MediaHeaders.wavDurationMs(pngBytes(2, 2)) === None)
    assert(MediaHeaders.wavDurationMs("RIFFxxxxNOPE".getBytes) === None)
  }

  test("decode dispatches on real headers through the Dataset path") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", pngBytes(800, 600), 1L),
      Multimodal.MediaRow(2L, "audio", wavBytes(16000, 48000), 2L),
      Multimodal.MediaRow(3L, "video", "opaque non-media payload".getBytes, 3L))
    val out = Multimodal.decode(rows.toDS()).collect()
      .map(d => d.media_id -> d).toMap
    assert(out(1L).width === 800 && out(1L).height === 600 &&
      out(1L).duration_ms === 0L)
    assert(out(2L).duration_ms === 3000L &&
      out(2L).width === 0 && out(2L).height === 0)
    assert(out(3L).width >= 1 && out(3L).height >= 1) // fallback path
  }
}
