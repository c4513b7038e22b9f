package graft.streaming

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

import graft.maintain.Snapshots

/** Structured-Streaming source over a [[graft.maintain.Snapshots]]
  * table — the table-format streaming read (Delta's `readStream` /
  * Iceberg's incremental-scan semantics) built on the v1 `Source`
  * contract, which is exactly the right shape here: offsets ARE
  * version numbers, and `getBatch(from, to)` IS the existing
  * manifest-diff CDC read.
  *
  *   - '''Offsets = committed versions.''' `getOffset` resolves the
  *     table head (one tiny directory listing); the engine's offset
  *     log records it, so each micro-batch covers one version range
  *     `(lastCommitted, head]` — commits are the batch boundaries.
  *   - '''Exactly-once by determinism.''' A version range always
  *     re-plans the same immutable files
  *     ([[Snapshots.appendedFilesBetween]] — manifests never change
  *     once claimed), so the engine's checkpoint replay of the last
  *     batch re-reads identical rows; combined with an idempotent sink
  *     (or a keyed snapshot append downstream) the pipeline is
  *     exactly-once end to end.
  *   - '''Rewrites refuse loudly.''' A compact/upsert/delete/overwrite
  *     in the range fails the batch with the same message as the batch
  *     CDC read: rewritten files are not row-level additions, and
  *     silently serving them would double-count. Stream the
  *     append-only phase of a table; run maintenance with the stream
  *     stopped (the standard Delta `ignoreChanges`-off posture) — OR
  *     pass `option("tolerateCompaction", "true")` to cross
  *     row-preserving compact commits live: appended rows then resolve
  *     per STEP from each append's own manifest (still exactly-once —
  *     the per-step file lists are as immutable as the endpoint diff),
  *     compact steps serve nothing, and row-CHANGING rewrites still
  *     refuse. Small-file maintenance no longer stops the consumer.
  *   - '''Metadata-only planning.''' Each batch plans ONLY the delta
  *     files — no table re-scan, no directory walk over data; the scan
  *     itself is a plain parquet read with the declared schema, so
  *     pushdown applies and files from before a column existed
  *     null-fill. Schema is pinned at stream start (head version's).
  *
  * 100 TB posture: the consumer's cost per trigger is O(new data) +
  * O(retained versions) metadata — the corpus-maintenance tail loop
  * (`pipeline_cdc_dedup`, live) never re-touches the table body.
  * Retention contract: `expire` must keep the stream's last committed
  * version's manifest (same replay-window rule as keyed appends) —
  * an expired `fromV` fails loudly at the manifest read, never
  * silently skips rows.
  */
class SnapshotSourceProvider extends StreamSourceProvider {

  private def tableSchema(
      spark: SparkSession, parameters: Map[String, String]): StructType = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "snapshot source requires option(\"path\", <table>)"))
    Snapshots.read(spark, path).schema
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-snapshot",
      schema.getOrElse(tableSchema(sqlContext.sparkSession, parameters)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "snapshot source requires option(\"path\", <table>)"))
    val fromV = parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
    val tolerate = parameters.get("tolerateCompaction")
      .exists(_.toBoolean)
    val cap = parameters.get("maxVersionsPerBatch").map(_.toInt).getOrElse(0)
    new SnapshotSource(spark, path,
      schema.getOrElse(tableSchema(spark, parameters)), fromV, tolerate,
      metadataPath, cap)
  }
}

/** The shared offset machinery of the two snapshot sources —
  * version-number offsets plus `maxVersionsPerBatch` rate limiting:
  * with `N > 0`, [[offerOffset]] offers at most N versions past the
  * persisted high-water mark — bounding every catch-up micro-batch
  * (a consumer starting cold on a long commit history, or resuming
  * after downtime, processes N commits per trigger instead of one
  * giant batch; Delta's maxFilesPerTrigger posture).
  *
  * Safety invariant — NEVER offer below a committed offset (a lower
  * offer makes the engine run a backward batch and then RE-SERVE
  * already-committed versions: duplicates): the mark is persisted to
  * `<metadataPath>/high-water` BEFORE an offset is offered, so it is
  * a durable UPPER bound on anything the engine can ever commit. A
  * capped offer whose persist fails is withheld (retried next
  * trigger — the engine's own checkpoint shares this filesystem, so
  * a persistently failing mark write stalls an engine that could not
  * checkpoint either); an unreadable/truncated mark (crash mid-write)
  * degrades the next offer to UNCAPPED (head ≥ committed always),
  * after which persistence re-establishes the cap. Every failure
  * mode is therefore a BIGGER batch, never a duplicate.
  *
  * Caveat: `Trigger.AvailableNow` latches the end offset at query
  * start through its wrapper, so the cap bounds ProcessingTime /
  * Once triggers; catch-up under AvailableNow arrives as one batch. */
private[streaming] trait VersionRateLimit extends Logging {
  protected def spark: SparkSession
  protected def metadataPath: String
  protected def maxVersionsPerBatch: Int
  protected def startingVersion: Long

  private lazy val markPath = new HadoopPath(s"$metadataPath/high-water")
  private lazy val markFs = markPath.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  /** Offsets round-trip through the engine's JSON checkpoint log, so
    * a replayed offset arrives as SerializedOffset — `json` is the
    * one accessor every form shares. */
  protected def versionOf(o: OffsetV1): Long = o.json.trim.toLong

  /** The durable mark: highest version ever OFFERED (≥ anything
    * committed). None = the mark file exists but cannot be parsed
    * (crash mid-write) — the stale-unknown state that forces one
    * uncapped offer. An absent file is a FRESH stream (nothing was
    * ever offered), which starts cleanly from `startingVersion`. */
  private var persistedMark: Option[Long] = {
    if (maxVersionsPerBatch <= 0) Some(startingVersion)
    else try {
      if (!markFs.exists(markPath)) Some(startingVersion)
      else {
        val in = markFs.open(markPath)
        val txt =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).trim
          finally in.close()
        txt.toLongOption.map(math.max(_, startingVersion))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"high-water read failed (next offer uncapped): " +
          e.getMessage)
        None
    }
  }

  /** Raise the durable mark to at least `v`; true when the mark is
    * known ≥ v on return. No-write fast path when already there. */
  private def ensureMark(v: Long): Boolean =
    persistedMark.exists(_ >= v) || {
      try {
        // single create-overwrite: a crash mid-write leaves an
        // unparsable file, which reads back as the safe unknown state
        val out = markFs.create(markPath, true)
        try out.write(v.toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        persistedMark = Some(v)
        true
      } catch {
        case scala.util.control.NonFatal(e) =>
          logWarning(s"high-water persist failed (offer withheld): " +
            e.getMessage)
          false
      }
    }

  /** Batch boundaries the engine reveals (getBatch arguments — the
    * v1 recovery contract re-calls it with logged ranges) raise the
    * mark too, healing it after an unparsable read. */
  protected def observe(v: Long): Unit =
    if (maxVersionsPerBatch > 0 &&
        !persistedMark.exists(_ >= v)) ensureMark(v)

  /** The offset to offer for table head `head`: capped to
    * mark + N when rate-limited (and only once that cap is durable),
    * `head` when uncapped or when the mark is unknown. None = nothing
    * new to offer (or a withheld offer after a failed persist). */
  protected def offerOffset(head: Long): Option[OffsetV1] = {
    val offer =
      if (maxVersionsPerBatch <= 0) head
      else persistedMark match {
        case Some(m) => math.min(head, m + maxVersionsPerBatch)
        case None    => head // unknown mark: uncapped is always safe
      }
    if (offer <= startingVersion) None
    else if (maxVersionsPerBatch > 0 && !ensureMark(offer)) None
    else Some(LongOffset(offer))
  }

  /** Re-tag a batch file relation as streaming — the one documented
    * private[sql] doorway, the same construction Spark's own
    * FileStreamSource performs (MicroBatchExecution asserts the
    * returned frame is a streaming one). */
  protected def tagStreaming(batchDf: DataFrame): DataFrame = {
    val plan = batchDf.queryExecution.analyzed.transformUp {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
    }
    org.apache.spark.sql.graft.GraftSqlShim.ofRows(spark, plan)
  }
}

private[streaming] class SnapshotSource(
    protected val spark: SparkSession,
    path: String,
    tableSchema: StructType,
    protected val startingVersion: Long,
    tolerateCompaction: Boolean = false,
    protected val metadataPath: String = "",
    protected val maxVersionsPerBatch: Int = 0)
    extends Source with VersionRateLimit {

  override def schema: StructType = tableSchema

  /** The table head (capped to `maxVersionsPerBatch` past the durable
    * high-water mark when rate-limited), offered monotonically
    * (versions only grow; expire only drops from the OLD end). None
    * until a version past the starting point exists — "no data yet",
    * not an error. */
  override def getOffset: Option[OffsetV1] =
    offerOffset(Snapshots.versions(spark, path).lastOption.getOrElse(0L))

  override def getBatch(
      start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val fromV = start.map(versionOf).getOrElse(startingVersion)
    val toV = versionOf(end)
    observe(math.max(fromV, toV))
    // an already-caught-up replay (start == end) is an empty batch,
    // not an error
    val delta =
      if (fromV >= toV) Seq.empty[String]
      else Snapshots.appendedFilesBetween(spark, path, fromV, toV,
        tolerateCompaction)
    tagStreaming(spark.read.schema(tableSchema).parquet(delta: _*))
  }

  override def commit(end: OffsetV1): Unit = observe(versionOf(end))
  override def stop(): Unit = ()
  override def toString: String =
    s"SnapshotSource[$path, from v$startingVersion]"
}
