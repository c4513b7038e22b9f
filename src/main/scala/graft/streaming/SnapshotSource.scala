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

/** Version-offset rate limiting shared by the two snapshot sources:
  * with `maxVersionsPerBatch = N > 0`, `getOffset` offers at most N
  * versions past the highest offset the engine is known to hold —
  * bounding every catch-up micro-batch (a consumer starting cold on
  * a long commit history, or resuming after downtime, processes N
  * commits per trigger instead of one giant batch; Delta's
  * maxFilesPerTrigger posture). The high-water mark advances from
  * `getBatch`'s own arguments (the engine re-calls it with the last
  * committed range on restart — the v1 `Source` recovery contract)
  * AND persists through a tiny `<metadataPath>/high-water` file on
  * `commit` so a restart can never offer an offset BELOW the
  * engine's committed one (batches are capped at N, and the persisted
  * mark is at most one batch behind, so mark+N ≥ committed always).
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

  /** Highest version offset known durable engine-side. */
  protected var highWater: Long = {
    val persisted =
      try {
        if (maxVersionsPerBatch > 0 && markFs.exists(markPath)) {
          val in = markFs.open(markPath)
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).trim.toLong
          finally in.close()
        } else 0L
      } catch {
        case scala.util.control.NonFatal(e) =>
          logWarning(s"high-water read failed (cap degrades to " +
            s"uncapped first offer): ${e.getMessage}"); 0L
      }
    math.max(startingVersion, persisted)
  }

  protected def observe(v: Long): Unit =
    highWater = math.max(highWater, v)

  protected def capOffer(head: Long): Long =
    if (maxVersionsPerBatch <= 0) head
    else math.min(head, highWater + maxVersionsPerBatch)

  protected def persistHighWater(v: Long): Unit = {
    observe(v)
    if (maxVersionsPerBatch > 0) try {
      val tmp = new HadoopPath(s"$metadataPath/.high-water.tmp")
      val out = markFs.create(tmp, true)
      try out.write(highWater.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (markFs.exists(markPath)) markFs.delete(markPath, false)
      markFs.rename(tmp, markPath)
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"high-water persist failed: ${e.getMessage}")
    }
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

  /** Offsets round-trip through the engine's JSON checkpoint log, so a
    * replayed offset arrives as SerializedOffset — `json` is the one
    * accessor every form shares. */
  private def versionOf(o: OffsetV1): Long = o.json.trim.toLong

  /** The table head (capped to `maxVersionsPerBatch` past the
    * high-water mark when rate-limited), offered monotonically
    * (versions only grow; expire only drops from the OLD end). None
    * until a version past the starting point exists — "no data yet",
    * not an error. */
  override def getOffset: Option[OffsetV1] = {
    val head = Snapshots.versions(spark, path).lastOption.getOrElse(0L)
    val offer = capOffer(head)
    if (offer <= startingVersion) None else Some(LongOffset(offer))
  }

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
    // MicroBatchExecution asserts the returned frame is a STREAMING
    // one; a file-list parquet relation is a batch plan, so the leaf
    // is re-tagged through the one documented private[sql] doorway
    // (same construction Spark's own FileStreamSource performs).
    val batchDf = spark.read.schema(tableSchema).parquet(delta: _*)
    val plan = batchDf.queryExecution.analyzed.transformUp {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
    }
    org.apache.spark.sql.graft.GraftSqlShim.ofRows(spark, plan)
  }

  override def commit(end: OffsetV1): Unit =
    persistHighWater(versionOf(end))
  override def stop(): Unit = ()
  override def toString: String =
    s"SnapshotSource[$path, from v$startingVersion]"
}
