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

  // -- malformed containers must degrade, not hang or throw ----------

  private def le(i: Int) = Array(i.toByte, (i >> 8).toByte,
    (i >> 16).toByte, (i >> 24).toByte)
  private def le16(i: Int) = Array(i.toByte, (i >> 8).toByte)

  test("hostile RIFF chunk sizes terminate the walk instead of looping") {
    import Multimodal.MediaHeaders
    // size -8: with signed arithmetic the offset never advances
    // (8 + (-8) = 0) — the walk must treat it as unsigned and stop
    val stuck = "RIFF".getBytes ++ le(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le(-8) ++
      "data".getBytes ++ le(4) ++ Array[Byte](1, 2, 3, 4)
    assert(MediaHeaders.wavDurationMs(stuck) === None)
    assert(MediaHeaders.wavFormat(stuck) === None)
    // size near Int.MaxValue: signed `off + 8 + size` wraps negative
    // and indexes before the array — must also just end the walk
    val wrap = "RIFF".getBytes ++ le(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le(0x7FFFFFF0) ++
      "fmt ".getBytes ++ le(16) ++ Array.fill[Byte](16)(0)
    assert(MediaHeaders.wavDurationMs(wrap) === None)
    assert(MediaHeaders.wavFormat(wrap) === None)
  }

  test("decode falls back to synthetic metadata on malformed media") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val bad = "RIFF".getBytes ++ le(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le(-8) ++ "data".getBytes ++ le(4) ++
      Array[Byte](1, 2, 3, 4)
    val out = Multimodal.decode(
      Seq(Multimodal.MediaRow(9L, "audio", bad, 9L)).toDS()).collect()
    assert(out.length == 1)
    assert(out.head.width >= 1 && out.head.height >= 1) // synthetic path
  }

  test("16-bit WAV declaring blockAlign=1 is rejected, not mis-indexed") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    // header says mono/16-bit but blockAlign=1: nSamples would equal
    // dataBytes and the high-byte read would index past the payload
    val lying = "RIFF".getBytes ++ le(36 + 6) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le(16) ++ le16(1) ++ le16(1) ++
      le(8000) ++ le(8000) ++ le16(1) ++ le16(16) ++
      "data".getBytes ++ le(6) ++ Array[Byte](1, 2, 3, 4, 5, 6)
    assert(Multimodal.MediaHeaders.wavFormat(lying).exists(_.blockAlign == 1))
    val out = Multimodal.sampleAudioFrames(
      Seq(Multimodal.MediaRow(1L, "audio", lying, 1L)).toDS(), everyMs = 1)
      .collect()
    assert(out.isEmpty, "malformed blockAlign must drop the row")
  }

  /** A REAL PNG (encoder: the JDK's own ImageIO) with a gradient so
    * resizing has actual pixel content to interpolate. */
  private def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** [[realPng]] with the horizontal gradient reversed — a genuinely
    * different luma-gradient signature at any size. */
  private def reversedPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((255 - x * 255 / w) << 16) | ((y * 255 / h) << 8))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A real 16-bit mono PCM WAV of a sine at `freq` Hz. */
  private def realWav(rate: Int, ms: Int, freq: Double): Array[Byte] = {
    val n = rate * ms / 1000
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * freq * i / rate) * 30000).toShort
      pcm(i * 2) = v.toByte
      pcm(i * 2 + 1) = (v >> 8).toByte
    }
    def le(i: Int) = Array(i.toByte, (i >> 8).toByte,
      (i >> 16).toByte, (i >> 24).toByte)
    def le16(i: Int) = Array(i.toByte, (i >> 8).toByte)
    "RIFF".getBytes ++ le(36 + pcm.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le(16) ++ le16(1) ++ le16(1) ++
      le(rate) ++ le(rate * 2) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le(pcm.length) ++ pcm
  }

  test("planted containers round-trip: generated bytes parse back to the arithmetic") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val media = Multimodal.plantedMedia(docs, n = 20).cache()
    assert(media.count() == 20)
    // every even id is a real PNG the JDK can decode; every odd id a
    // real WAV our own header parser accepts
    val decoded = Multimodal.decode(media).collect()
    decoded.foreach { r =>
      if (r.media_id % 2 == 0) {
        assert(r.width == 16 + (r.media_id % 29).toInt, s"id ${r.media_id}")
        assert(r.height == 12 + (r.media_id % 13).toInt)
        assert(r.duration_ms == 0L)
      } else {
        val nSamples = 800 + (r.media_id % 10).toInt * 80
        assert(r.duration_ms == nSamples / 8, s"id ${r.media_id}")
        assert(r.width == 0 && r.height == 0)
      }
    }
    // resize: longest edge lands exactly on maxDim
    val resized = Multimodal.resizeImages(
      media.filter($"modality" === "image"), maxDim = 10).collect()
    assert(resized.length == 10)
    resized.foreach(r => assert(math.max(r.width, r.height) == 10))
    // frame sampling: stride arithmetic + first amplitude
    val frames = Multimodal.sampleAudioFrames(
      media.filter($"modality" === "audio"), everyMs = 25).collect()
    assert(frames.length == 10)
    frames.foreach { f =>
      val nSamples = 800 + (f.media_id % 10).toInt * 80
      assert(f.n_frames == (nSamples + 199) / 200, s"id ${f.media_id}")
      val expected = ((f.media_id * 31) % 200 - 100) * 150 / 32768.0
      assert(math.abs(f.frames(0) - expected) < 1e-9)
    }
  }

  test("resize decodes, scales, and re-encodes real PNGs (JDK ImageIO)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", realPng(64, 48), 1L),
      Multimodal.MediaRow(2L, "image", realPng(20, 80), 2L),
      Multimodal.MediaRow(3L, "audio", realWav(8000, 100, 440), 3L))
    val out = Multimodal.resizeImages(rows.toDS(), maxDim = 32)
      .collect().map(r => r.media_id -> r).toMap
    assert(out.keySet == Set(1L, 2L), "non-images must drop out")
    assert(out(1L).orig_width == 64 && out(1L).width == 32 &&
      out(1L).height == 24)
    assert(out(2L).width == 8 && out(2L).height == 32)
    // the output is itself a valid PNG at the stated dimensions
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).png))
    assert(back.getWidth == 32 && back.getHeight == 24)
    assert(Multimodal.MediaHeaders.pngDimensions(out(1L).png)
      .contains((32, 24)))
  }

  test("audio frame-sampling reads real PCM amplitudes at the stride") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    // 8 kHz sine at 100 Hz: sample every 25 ms = every 200 samples =
    // exactly 20 periods, so every sampled amplitude is sin(0) = 0.
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", realWav(8000, 200, 100), 1L),
      Multimodal.MediaRow(2L, "image", realPng(8, 8), 2L))
    val out = Multimodal.sampleAudioFrames(rows.toDS(), everyMs = 25)
      .collect().map(r => r.media_id -> r).toMap
    assert(out.keySet == Set(1L), "non-audio must drop out")
    val f = out(1L)
    assert(f.sample_rate == 8000)
    assert(f.n_frames == 8, s"200ms / 25ms = 8 frames, got ${f.n_frames}")
    assert(f.frames.forall(a => math.abs(a) < 0.01),
      s"period-aligned samples should be ~0: ${f.frames.mkString(",")}")
    // an off-period stride sees non-zero amplitudes
    val off = Multimodal.sampleAudioFrames(
      Seq(Multimodal.MediaRow(1L, "audio", realWav(8000, 200, 101), 1L))
        .toDS(), everyMs = 25).collect().head
    assert(off.frames.exists(a => math.abs(a) > 0.1))
  }

  test("withTextChunk changes bytes, preserves pixels and decodability") {
    val png = realPng(9, 7)
    val wrapped = Multimodal.withTextChunk(png, "comment", "variant")
    assert(!java.util.Arrays.equals(png, wrapped), "container bytes differ")
    assert(wrapped.length == png.length + 12 + "comment variant".length)
    // both decode, to identical pixels
    val pd1 = Multimodal.pixelDigest(png)
    val pd2 = Multimodal.pixelDigest(wrapped)
    assert(pd1.isDefined && pd1 == pd2, "pixel identity survives the chunk")
    // a genuinely different image has a different pixel digest
    assert(Multimodal.pixelDigest(realPng(9, 8)) != pd1)
    // non-image bytes don't decode
    assert(Multimodal.pixelDigest("not a png".getBytes).isEmpty)
  }

  test("withInfoChunk + pcmDigest: metadata chunk changes bytes, not PCM identity") {
    val wav = realWav(8000, 100, 50)
    val wrapped = Multimodal.withInfoChunk(wav, "re-tagged by tool")
    assert(!java.util.Arrays.equals(wav, wrapped))
    val d1 = Multimodal.pcmDigest(wav)
    val d2 = Multimodal.pcmDigest(wrapped)
    assert(d1.isDefined && d1 == d2, "PCM identity survives the chunk")
    // different audio content → different digest; garbage → None
    assert(Multimodal.pcmDigest(realWav(8000, 100, 51)) != d1)
    assert(Multimodal.pcmDigest("not a wav".getBytes).isEmpty)
    // the wrapped container still parses (duration unchanged)
    assert(Multimodal.MediaHeaders.wavDurationMs(wrapped) ==
      Multimodal.MediaHeaders.wavDurationMs(wav))
  }

  test("pixelDedupGroups: metadata variants group by pixels, not bytes") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val a = realPng(8, 8)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", a, 1L),
      Multimodal.MediaRow(2L, "image",
        Multimodal.withTextChunk(a, "k", "v"), 2L),   // pixel dup of 1
      Multimodal.MediaRow(3L, "image", a.clone(), 3L), // byte dup of 1
      Multimodal.MediaRow(4L, "image", realPng(5, 5), 4L),
      Multimodal.MediaRow(5L, "audio", realWav(8000, 100, 50), 5L))
    val got = Multimodal.pixelDedupGroups(rows.toDS())
      .orderBy("media_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L), "images only")
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, 3L, 2L, 1L)), got.toString)
    assert(byId(2L) == ((2L, 3L, 1L, 1L)),
      s"the wrapped copy joins the pixel group but not the byte group: $got")
    assert(byId(3L) == ((3L, 3L, 2L, 1L)), got.toString)
    assert(byId(4L) == ((4L, 1L, 1L, 4L)), got.toString)
  }

  test("dhash64: hand-computed gradient bits on a step image") {
    // 9x8, columns 0-3 black, 4-8 white: exactly one rising gradient
    // per row, at gx=3 → bits {y*8+3 | y<8}, every other bit clear
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 9; y <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val got = Multimodal.dhash64(bos.toByteArray).get
    val want = (0 until 8).map(y => 1L << (y * 8 + 3)).reduce(_ | _)
    assert(got == want, f"got $got%016x want $want%016x")
  }

  test("withGrayscale preserves dhash64, changes pixels and bytes") {
    val png = realPng(16, 12)
    val gray = Multimodal.withGrayscale(png)
    assert(!java.util.Arrays.equals(png, gray))
    assert(Multimodal.pixelDigest(png) != Multimodal.pixelDigest(gray),
      "grayscale re-render must have different pixels")
    assert(Multimodal.dhash64(png) == Multimodal.dhash64(gray),
      "dHash is exactly invariant under the integer-luma grayscale")
    assert(Multimodal.dhash64(png).isDefined)
  }

  test("dhash64 discriminates: 30 distinct planted images, 30 hashes") {
    import spark.implicits._
    val docs = spark.range(60).toDF("doc_id")
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val hashes = Multimodal.plantedMedia(docs)
      .filter(_.modality == "image")
      .collect()
      .map(r => Multimodal.dhash64(r.payload).get)
    assert(hashes.length == 30)
    assert(hashes.distinct.length == 30,
      "planted base images must not collide perceptually")
  }

  test("perceptualDedupGroups: three nested identity levels") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val a = realPng(16, 12)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", a, 1L),
      Multimodal.MediaRow(2L, "image", Multimodal.withGrayscale(a), 2L),
      Multimodal.MediaRow(3L, "image",
        Multimodal.withTextChunk(a, "k", "v"), 3L),
      Multimodal.MediaRow(4L, "image", a.clone(), 4L),
      // NOT realPng(20,15): dHash is scale-invariant by design, so a
      // rescaled copy of the same gradient would (correctly) join the
      // perceptual group — use a reversed gradient instead
      Multimodal.MediaRow(5L, "image", reversedPng(16, 12), 5L))
    val got = Multimodal.perceptualDedupGroups(rows.toDS())
      .orderBy("media_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .map(r => r._1 -> r).toMap
    // 1,3,4 share pixels; 1,4 share bytes; 1,2,3,4 share the dHash
    assert(got(1L) == ((1L, 4L, 3L, 2L, 1L)), got.toString)
    assert(got(2L) == ((2L, 4L, 1L, 1L, 1L)),
      s"gray re-render groups only perceptually: $got")
    assert(got(3L) == ((3L, 4L, 3L, 1L, 1L)), got.toString)
    assert(got(4L) == ((4L, 4L, 3L, 2L, 1L)), got.toString)
    assert(got(5L) == ((5L, 1L, 1L, 1L, 5L)), got.toString)
  }
}
