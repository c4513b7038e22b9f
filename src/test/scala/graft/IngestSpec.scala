package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Flatten, JsonApi, ParquetSink}

/** End-to-end ingest: fixture JSON:API tree (FIXTURES.md §A) → three
  * flat tables → partitioned sink round-trip. Covers S1/S5/S6, P1-P3,
  * K1/K2 and the layout variants of convert_to_iceberg.py:437-472. */
class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def comment(id: String, docket: String, withAttachments: Boolean,
      extra: String = ""): String = {
    val att = if (withAttachments)
      """{"data": [{"id": "att-1", "type": "attachments"},
                   {"id": "att-2", "type": "attachments"}]}"""
    else """{"data": []}"""
    val inc = if (withAttachments)
      """[{"id": "att-1", "type": "attachments"}]""" else "[]"
    s"""{
      "data": {
        "id": "$id", "type": "comments",
        "links": {"self": "https://api.example.gov/v4/comments/$id"},
        "attributes": {
          "commentOn": "0900006486", "docketId": "$docket",
          "agencyId": "${docket.split("-")(0)}",
          "comment": "I recommend this rule change for everyone",
          "firstName": "Jane", "lastName": "Doe",
          "organization": null, "documentType": "Public Submission",
          "withdrawn": false, "reasonWithdrawn": null,
          "postedDate": "2025-03-01T05:00:00Z",
          "receiveDate": "2025-02-27T05:00:00Z",
          "title": "Comment on $docket"$extra
        },
        "relationships": {"attachments": $att}
      },
      "included": $inc
    }"""
  }

  def docketJson(id: String): String =
    s"""{"data": {"id": "$id", "type": "dockets",
         "links": {"self": "https://api.example.gov/v4/dockets/$id"},
         "attributes": {"agencyId": "${id.split("-")(0)}",
           "docketType": "Rulemaking", "title": "Docket $id",
           "modifyDate": "2025-01-01T00:00:00Z"},
         "relationships": {"documents": {"data": [{"id": "d1", "type": "documents"}]}}}}"""

  def documentJson(id: String, docket: String): String =
    s"""{"data": {"id": "$id", "type": "documents",
         "links": {"self": "https://api.example.gov/v4/documents/$id"},
         "attributes": {"docketId": "$docket",
           "agencyId": "${docket.split("-")(0)}",
           "documentType": "Rule", "objectId": "0900006486",
           "postedDate": "2025-01-15T00:00:00Z", "title": "Doc $id"},
         "relationships": {"attachments": {"data": [{"id": "a", "type": "attachments"}]}}}}"""

  def write(path: String, content: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  /** Fixture tree: DEA docket (plain layout, 3 comments + 1 corrupt),
    * CMS docket (text-* layout), EPA docket (nested raw-data layout),
    * FDA docket with no comments folder (skip path). */
  lazy val root: String = {
    val r = TestSpark.tmpDir("ingest")
    val dea = s"$r/raw-data/DEA/DEA-2016-0015"
    write(s"$dea/docket/DEA-2016-0015.json", docketJson("DEA-2016-0015"))
    write(s"$dea/documents/DEA-2016-0015-0001.json",
      documentJson("DEA-2016-0015-0001", "DEA-2016-0015"))
    write(s"$dea/comments/DEA-2016-0015-0002.json",
      comment("DEA-2016-0015-0002", "DEA-2016-0015", withAttachments = true))
    write(s"$dea/comments/DEA-2016-0015-0003.json",
      comment("DEA-2016-0015-0003", "DEA-2016-0015", withAttachments = false,
        extra = """, "customField": "overflow-value""""))
    write(s"$dea/comments/DEA-2016-0015-0004.json",
      comment("DEA-2016-0015-0004", "DEA-2016-0015", withAttachments = false))
    write(s"$dea/comments/broken.json", """{"data": {"id": "x", BROKEN""")

    val cms = s"$r/raw-data/CMS/CMS-2025-0020/text-CMS-2025-0020"
    write(s"$cms/comments/CMS-2025-0020-0002.json",
      comment("CMS-2025-0020-0002", "CMS-2025-0020", withAttachments = false))
    write(s"$cms/docket/CMS-2025-0020.json", docketJson("CMS-2025-0020"))

    val epa = s"$r/raw-data/EPA/EPA-2024-0001/raw-data/EPA/EPA-2024-0001"
    write(s"$epa/comments/EPA-2024-0001-0002.json",
      comment("EPA-2024-0001-0002", "EPA-2024-0001", withAttachments = false))

    write(s"$r/raw-data/FDA/FDA-2024-0009/docket/FDA-2024-0009.json",
      docketJson("FDA-2024-0009"))
    r
  }

  test("discovery finds all layout variants") {
    val found = JsonApi.discover(spark, root)
    val byKind = found.groupBy(_.kind).view.mapValues(_.size).toMap
    assert(byKind("comments") == 3) // DEA plain, CMS text-*, EPA nested
    assert(byKind("docket") == 3) // DEA, CMS, FDA
    assert(byKind("documents") == 1)
    assert(found.exists(d => d.agency == "EPA" && d.dir.contains("raw-data/EPA/EPA-2024-0001/raw-data")))
  }

  lazy val tables = JsonApi.readDocketTree(spark, root)

  test("comments flatten: counts, flags, typed overlay, map overflow") {
    val c = tables("comments").cache()
    assert(c.count() == 5) // 3 DEA + 1 CMS + 1 EPA; corrupt excluded
    val withAtt = c.filter(col("id") === "DEA-2016-0015-0002").head()
    assert(withAtt.getAs[Boolean]("has_attachments"))
    assert(withAtt.getAs[Int]("attachment_count") == 2)
    assert(withAtt.getAs[Boolean]("has_included_attachments"))
    assert(withAtt.getAs[Int]("included_attachment_count") == 1)
    assert(withAtt.getAs[Boolean]("withdrawn") == false)
    assert(withAtt.getAs[String]("agency") == "DEA")
    assert(withAtt.getAs[java.sql.Timestamp]("postedDate") != null)
    // unknown attribute survives in the overflow map
    val overflow = c.filter(col("id") === "DEA-2016-0015-0003")
      .select(element_at(col("attrs"), "customField")).head().getString(0)
    assert(overflow == "overflow-value")
    assert(c.select("agency").distinct().count() == 3)
  }

  test("corrupt records quarantined, not fatal") {
    val raw = JsonApi.readRaw(spark,
      JsonApi.discover(spark, root).filter(_.kind == "comments").map(_.dir))
    assert(JsonApi.corruptRecords(raw).count() == 1)
  }

  test("docket_info + documents flatten with rel_counts map") {
    assert(tables("docket_info").count() == 3)
    val d = tables("documents").head()
    assert(d.getAs[Map[String, Int]]("rel_counts")("attachments") == 1)
    val dk = tables("docket_info").filter(col("id") === "DEA-2016-0015").head()
    assert(dk.getAs[Map[String, Int]]("rel_counts")("documents") == 1)
    assert(dk.getAs[String]("title") == "Docket DEA-2016-0015")
  }

  test("agency derivation edge cases (convert_to_iceberg.py:404-411)") {
    import spark.implicits._
    val got = Seq("EPA/sub-id", "DEA-2016-0015", "plainid", null)
      .toDF("id")
      .select(Flatten.agencyFromId(col("id")).as("a"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("EPA", "DEA", "UNKNOWN", "UNKNOWN"))
  }

  test("partitioned sink round-trip + skip-if-empty + partition pruning") {
    val out = TestSpark.tmpDir("sink")
    val c = tables("comments")
    assert(ParquetSink.write(c, s"$out/comments", "zstd", Seq("agency")))
    // empty input → skipped, nothing written
    assert(!ParquetSink.write(c.filter(lit(false)), s"$out/empty"))
    assert(!Files.exists(Paths.get(s"$out/empty")))
    // brotli aliases to zstd rather than failing
    assert(ParquetSink.write(c.limit(1), s"$out/brotli_alias", "brotli"))
    intercept[IllegalArgumentException] {
      ParquetSink.write(c, s"$out/bad", "lzo")
    }
    val back = spark.read.parquet(s"$out/comments")
    assert(back.count() == 5)
    // agency filter becomes partition pruning, not a data filter
    val plan = back.filter(col("agency") === "DEA")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(agency"))
    assert(back.filter(col("agency") === "DEA").count() == 3)
  }

  test("readRaw selects only .json files (pathGlobFilter contract)") {
    // the round-14 listing fix moved the *.json selection from a
    // per-dir driver glob to pathGlobFilter over plain roots — this
    // pins that the selection is unchanged: a planted non-json file
    // in a comments dir must not reach the reader
    val dir = TestSpark.tmpDir("readraw-filter") + "/comments"
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "c1.json"),
      """{"data":{"id":"X-1","type":"comments","attributes":{},"links":{}}}"""
        .getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "README.txt"),
      "not json".getBytes("UTF-8"))
    val raw = graft.sources.JsonApi.readRaw(spark, Seq(dir))
    assert(raw.count() == 1)
    val files = raw.select("src_file").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(files.forall(_.endsWith(".json")), files.mkString(","))
  }
}
