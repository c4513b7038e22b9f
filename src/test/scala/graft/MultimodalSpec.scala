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

    val decoded = Multimodal.decodeStub(
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

  test("decode is deterministic (stable fake in place of real codec)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(50)
    val m = Multimodal.mediaFromDocuments(docs).as[Multimodal.MediaRow]
    val a = Multimodal.decodeStub(m).orderBy("media_id")
      .select("width", "height").as[(Int, Int)].collect().toSeq
    val b = Multimodal.decodeStub(m).orderBy("media_id")
      .select("width", "height").as[(Int, Int)].collect().toSeq
    assert(a == b)
  }
}
