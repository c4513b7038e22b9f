package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Deterministic on-disk JSON:API docket-tree builder.
  *
  * Reproduces the reference's raw-data layout
  * (agency/DOCKET/comments/…json — see reference
  * convert_to_iceberg.py:956-1121 and FIXTURES.md) with fully
  * deterministic content, so the same tree can be (a) ingested by
  * JsonApi/Flatten, (b) re-read by DuckDB's `read_json` as an
  * independent oracle, and (c) used as the ingest-throughput fixture.
  * No timestamps, randomness, or environment leaks into the payload.
  */
object FixtureTree {

  /** Write (idempotently) a comments tree under `root`:
    * `root/raw-data/AG/DOCKET/comments/DOCKET-i.json`.
    * Returns the number of dockets written. Re-running over an existing
    * complete tree is a no-op (same bytes rewritten only if missing).
    */
  def writeComments(
      root: String,
      agencies: Seq[String] = Seq("AAA", "BBB", "CCC"),
      nDockets: Int = 30,
      commentsPerDocket: Int = 10): Int = {
    for (d <- 0 until nDockets) {
      val agency = agencies(d % agencies.size)
      val docket = f"$agency-2025-$d%04d"
      val dir = Paths.get(s"$root/raw-data/$agency/$docket/comments")
      Files.createDirectories(dir)
      for (c <- 0 until commentsPerDocket) {
        val file = dir.resolve(f"$docket-$c%04d.json")
        if (!Files.exists(file))
          Files.writeString(file, commentJson(agency, docket, d, c))
      }
    }
    nDockets
  }

  /** One JSON:API comment document. Everything varies deterministically
    * so downstream filters/aggregates have non-degenerate values:
    * `withdrawn` and the posted hour cycle; every third comment carries
    * attachment relationship entries (and `included` blobs); the entity
    * id exercises all three branches of the agency-derivation law —
    * '-'-separated (normal), '/'-separated, and no-separator → UNKNOWN
    * (reference convert_to_iceberg.py:404-411). */
  private def commentJson(
      agency: String, docket: String, d: Int, c: Int): String = {
    val withdrawn = (d + c) % 7 == 0
    val hour = (d * 3 + c) % 24
    val id =
      if (d == 0 && c == 1) s"opaqueid$c"          // UNKNOWN branch
      else if (c == 0) s"$agency/$docket-$c"       // slash branch
      else s"$docket-$c"                           // dash branch
    val nAtt = if ((d + c) % 3 == 0) 1 + c % 2 else 0
    val attData = (0 until nAtt)
      .map(i => s"""{"id": "$docket-$c-att$i", "type": "attachments"}""")
      .mkString("[", ", ", "]")
    s"""{"data": {"id": "$id", "type": "comments",
       |  "links": {"self": "https://example.invalid/$docket-$c"},
       |  "attributes": {"docketId": "$docket", "agencyId": "$agency",
       |    "comment": "comment $c on docket $docket from agency $agency",
       |    "withdrawn": $withdrawn,
       |    "postedDate": "2025-03-01T${f"$hour%02d"}:00:00Z"},
       |  "relationships": {"attachments": {"data": $attData}}},
       | "included": $attData}""".stripMargin
  }

  /** Write (idempotently) a docket-info file per docket:
    * `root/raw-data/AG/DOCKET/docket/DOCKET.json`, with deterministic
    * relationship arrays of varying size (comments 1..4, documents
    * 0..2 — zero-length exercises the sz()=0 path) so the rel_counts
    * MAP projection has non-degenerate values to flatten. */
  def writeDockets(
      root: String,
      agencies: Seq[String] = Seq("AAA", "BBB", "CCC"),
      nDockets: Int = 30): Int = {
    for (d <- 0 until nDockets) {
      val agency = agencies(d % agencies.size)
      val docket = f"$agency-2025-$d%04d"
      val dir = Paths.get(s"$root/raw-data/$agency/$docket/docket")
      Files.createDirectories(dir)
      val file = dir.resolve(s"$docket.json")
      if (!Files.exists(file))
        Files.writeString(file, docketJson(agency, docket, d))
    }
    nDockets
  }

  private def docketJson(agency: String, docket: String, d: Int): String = {
    def refs(kind: String, n: Int) = (0 until n)
      .map(i => s"""{"id": "$docket-$kind$i", "type": "$kind"}""")
      .mkString("[", ", ", "]")
    val docketType = if (d % 2 == 0) "Rulemaking" else "Nonrulemaking"
    s"""{"data": {"id": "$docket", "type": "docket",
       |  "links": {"self": "https://example.invalid/docket/$docket"},
       |  "attributes": {"agencyId": "$agency", "docketType": "$docketType",
       |    "title": "Docket $docket",
       |    "modifyDate": "2025-02-0${d % 9 + 1}T0${d % 10}:30:00Z"},
       |  "relationships": {
       |    "comments": {"data": ${refs("comments", d % 4 + 1)}},
       |    "documents": {"data": ${refs("documents", d % 3)}}}}}""".stripMargin
  }

  /** Fixed shared location for the oracle-visible fixture: both the
    * Spark query and the DuckDB oracle SQL must reference the SAME
    * path, so it has to be deterministic across processes. */
  val oracleRoot: String = "/tmp/graft_ingest_fixture"

  /** Bump when commentJson output changes: a stale tree from an older
    * build under /tmp must be regenerated, not silently reused (files
    * are only written when missing). */
  private val contentVersion = "v3"

  /** Build (once) the oracle fixture tree and return its root. */
  def ensureOracleTree(): String = {
    val marker = Paths.get(oracleRoot, s".fixture_$contentVersion")
    if (!Files.exists(marker)) {
      deleteRecursively(Paths.get(oracleRoot))
      writeComments(oracleRoot)
      writeDockets(oracleRoot)
      Files.createDirectories(marker.getParent)
      Files.writeString(marker, contentVersion)
    }
    oracleRoot
  }

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = {
        val s = Files.list(p)
        try s.toArray(new Array[Path](_)).toSeq finally s.close()
      }
      children.foreach(deleteRecursively)
    }
    Files.deleteIfExists(p)
  }
}
