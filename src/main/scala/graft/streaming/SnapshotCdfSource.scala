package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.maintain.Snapshots

/** Structured-Streaming source over a snapshot table's ROW-level
  * CHANGE FEED ([[Snapshots.readChangeFeed]]) — the live CDC tail
  * that NEVER refuses: upserts arrive as update pre/post images,
  * deletes as delete rows, compactions as nothing, appends as plain
  * inserts — so a downstream consumer (a derived index, a dedup
  * reference, a serving copy) stays in sync with a table under FULL
  * maintenance, not just its append-only phase (Delta's
  * `readChangeFeed` streaming option is the same contract).
  *
  *   - '''Offsets = committed versions''', exactly like
  *     [[SnapshotSource]]; each micro-batch is the change feed of one
  *     version range `(lastCommitted, head]`.
  *   - '''Materialized batches.''' The v1 `Source` contract wants a
  *     single streaming-tagged file relation per batch, but a change
  *     feed's plan holds per-step diffs (the tagged multiset
  *     aggregate + the key
  *     classification join) — tagging THOSE leaves streaming would
  *     make the incremental planner read the diff as a stream-stream
  *     join. So `getBatch` computes the feed as a BATCH plan and
  *     spills it under the source's own checkpoint metadata dir
  *     (`<metadataPath>/cdf/<from>-<to>`), returning a plain tagged
  *     read of the spill. The spill is deterministic for its range
  *     (immutable manifests + deterministic diffs), and a replayed
  *     range overwrites its own dir — exactly-once survives crashes
  *     between spill and checkpoint commit.
  *   - '''Self-cleaning.''' `commit(end)` deletes spill dirs whose
  *     range ends at or before the committed offset — the engine
  *     never re-requests those; steady-state residue is at most the
  *     in-flight batch. Change volume is proportional to what the
  *     range's commits TOUCHED, so the spill is delta-sized, never
  *     table-sized.
  *   - '''Schema pinned at stream start''': the table head's columns
  *     plus `_change_type`/`_commit_version`/`_commit_ts_ms`. A
  *     column appearing mid-stream is ignored until restart; a
  *     column dropped mid-stream null-fills — the usual v1-source
  *     posture.
  *
  * Retention contract: every version in an uncommitted range must be
  * retained ([[Snapshots.readChangeFeed]] refuses loudly on an
  * expired step — never a silently wrong diff), the same keep-window
  * rule the keyed-append replay already imposes on `expire`.
  */
class SnapshotCdfSourceProvider extends StreamSourceProvider {

  private def feedSchema(
      spark: SparkSession, parameters: Map[String, String]): StructType = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "snapshot CDF source requires option(\"path\", <table>)"))
    StructType(Snapshots.read(spark, path).schema.fields ++ Seq(
      StructField(Snapshots.ChangeTypeCol, StringType),
      StructField(Snapshots.CommitVersionCol, LongType, nullable = false),
      StructField(Snapshots.CommitTsCol, LongType, nullable = false)))
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-snapshot-cdf",
      schema.getOrElse(feedSchema(sqlContext.sparkSession, parameters)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "snapshot CDF source requires option(\"path\", <table>)"))
    val fromV = parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
    val keyCols = parameters.get("keyCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val cap = parameters.get("maxVersionsPerBatch").map(_.toInt).getOrElse(0)
    new SnapshotCdfSource(spark, path,
      schema.getOrElse(feedSchema(spark, parameters)),
      fromV, keyCols, metadataPath, cap)
  }
}

private[streaming] class SnapshotCdfSource(
    protected val spark: SparkSession,
    path: String,
    feedSchema: StructType,
    protected val startingVersion: Long,
    keyCols: Seq[String],
    protected val metadataPath: String,
    protected val maxVersionsPerBatch: Int = 0)
    extends Source with VersionRateLimit {

  override def schema: StructType = feedSchema

  private def spillRoot = new Path(s"$metadataPath/cdf")

  private def fs = spillRoot.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  override def getOffset: Option[OffsetV1] =
    offerOffset(Snapshots.versions(spark, path).lastOption.getOrElse(0L))

  override def getBatch(
      start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val fromV = start.map(versionOf).getOrElse(startingVersion)
    val toV = versionOf(end)
    observe(math.max(fromV, toV))
    val files =
      if (fromV >= toV) Seq.empty[String] // caught-up replay: empty
      else {
        val dir = new Path(spillRoot, s"$fromV-$toV")
        // coalesce bounds the spill's FILE count for the steady-state
        // tiny-delta batch (a keyed diff's output partitioning is the
        // shuffle width) without serializing a large catch-up write
        Snapshots.readChangeFeed(spark, path, fromV, toV, keyCols)
          .coalesce(64)
          .write.mode("overwrite").parquet(dir.toString)
        Seq(dir.toString)
      }
    tagStreaming(spark.read.schema(feedSchema).parquet(files: _*))
  }

  /** Spills whose range ended at or before the committed offset are
    * never re-requested — drop them (best-effort; a leftover is
    * re-overwritten, never re-served). */
  override def commit(end: OffsetV1): Unit = {
    val endV = versionOf(end)
    observe(endV)
    try {
      if (fs.exists(spillRoot))
        fs.listStatus(spillRoot).foreach { st =>
          st.getPath.getName.split("-") match {
            case Array(_, t) if t.toLongOption.exists(_ <= endV) =>
              fs.delete(st.getPath, true)
            case _ => ()
          }
        }
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"cdf spill cleanup skipped: ${e.getMessage}")
    }
  }

  override def stop(): Unit = ()
  override def toString: String =
    s"SnapshotCdfSource[$path, from v$startingVersion]"
}
