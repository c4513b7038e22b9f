package graft.maintain

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Segmented table layout for the persisted serving indexes (LSH dedup,
  * BM25, IVF-PQ) — the Lucene-segments idea expressed as parquet
  * partition directories.
  *
  * Every APPENDABLE index table is a directory of segments
  * `table/seg=<segId>/…`; the initial build writes segment
  * [[BaseSeg]], and each incremental append writes exactly one new
  * segment. The point is idempotency under at-least-once replay: a
  * streaming micro-batch append (`foreachBatch` replays a batch whose
  * sink work committed but whose checkpoint didn't) re-runs with the
  * SAME deterministic segment id, and [[writeSegment]]'s
  * overwrite-own-directory semantics make the replay converge to the
  * exact same table instead of duplicating rows — the failure mode a
  * plain `mode("append")` sink has under replay (duplicated postings
  * double-count BM25 tf; duplicated codes return duplicate ANN ids).
  *
  * Readers see one logical table: Spark's partition discovery exposes
  * the segment id as a string `seg` column, which probes simply never
  * select. Associative statistics (BM25 df/stats, LSH bucket counts)
  * are stored per segment and SUMMED at probe time — exact integer
  * addition, so probe results are bit-identical to a merged table.
  * [[replaceTable]] is the compaction arm: it rewrites a
  * many-segment table as a single canonical [[BaseSeg]] under the
  * crash-safe [[Swap]] rename protocol, restoring the exact layout a
  * fresh build would produce.
  */
object Segments {

  /** The initial build's segment id. */
  val BaseSeg = "base"

  /** Scale-adaptive shard count for a segment write, derived from the
    * optimizer's size estimate of `sized` (exact for cached
    * relations, file-length sums for parquet scans — good to a small
    * constant factor, which file sizing tolerates):
    * `ceil(bytes / spark.graft.index.shardBytes)` clamped to
    * `[1, spark.graft.index.maxShards]`.
    *
    * Replaces the index writers' former constant 32, which was wrong
    * at both ends of the scale: a 10⁵-row corpus segment became 32
    * KB-files (per-file open/list/copy overhead dominating every
    * append and probe), and a 10¹³-row corpus would pack into 32
    * multi-TB shards (no scan parallelism, unsplittable row groups).
    * Defaults target the 128 MB–1 GB output-file band; override per
    * session for a different storage profile. */
  def shardCount(sized: DataFrame): Int = {
    val conf = sized.sparkSession.conf
    val target = conf.get("spark.graft.index.shardBytes",
      (128L * 1024 * 1024).toString).toLong
    val cap = conf.get("spark.graft.index.maxShards", "65536").toInt
    val bytes = sized.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (bytes + target - 1) / target
    n.min(cap).max(1).toInt
  }

  /** A fresh unique segment id for one-off batch appends (callers with
    * a replay story — the streaming arms — pass their batch id
    * instead, which is what makes the replay idempotent). */
  def freshSegId(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(16)

  private val SegIdPattern = "[A-Za-z0-9_-]+"

  /** Memoized head row of an index's one-row `meta` table, keyed by
    * (qualified meta dir, modification time): meta is written LAST
    * with overwrite mode as the index's validity marker and never
    * mutated in place, so the row stays valid while the same
    * directory is in place (a rebuild rewrites the dir → fresh
    * mtime → miss). Returns None when the dir or its `_SUCCESS`
    * marker is absent — the "no valid index" signal every
    * `*IndexExists` check starts from — or when the table is empty
    * (a corrupt meta reads as absent, not as a crash). One FS stat
    * replaces the per-probe Spark read+collect job over a 1-row
    * parquet that every indexed probe and existence check paid. */
  private val rowsMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), Seq[org.apache.spark.sql.Row]]()
  private val RowsMemoCap = 4096

  /** Collected rows of a small immutable metadata directory
    * (meta/centroids/codebook — tables rewritten only wholesale with
    * overwrite mode, never mutated in place), memoized per (qualified
    * dir, modification time); None when the dir is absent. Callers
    * own the "is this table small" judgment — this is for
    * metadata-class tables bounded by construction. */
  def localRows(spark: SparkSession,
      dir0: String): Option[Seq[org.apache.spark.sql.Row]] = {
    val dir = new Path(dir0)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st =
      try fs.getFileStatus(dir)
      catch { case _: java.io.FileNotFoundException => return None }
    val key = (fs.makeQualified(dir).toString, st.getModificationTime)
    val hit = rowsMemo.get(key)
    if (hit != null) return Some(hit)
    val rows = spark.read.parquet(dir.toString).collect().toSeq
    if (rowsMemo.size >= RowsMemoCap) rowsMemo.clear()
    rowsMemo.put(key, rows)
    Some(rows)
  }

  def metaRow(spark: SparkSession,
      indexPath: String): Option[org.apache.spark.sql.Row] = {
    val dir = new Path(s"$indexPath/meta")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ok =
      try fs.exists(new Path(dir, "_SUCCESS"))
      catch { case _: java.io.FileNotFoundException => false }
    if (!ok) None
    else localRows(spark, dir.toString).flatMap(_.headOption)
  }

  /** [[metaRow]] narrowed to the common existence probe: is there a
    * valid meta row whose `format` equals `expected`? */
  def metaFormatIs(spark: SparkSession, indexPath: String,
      expected: Int): Boolean =
    metaRow(spark, indexPath).exists(r =>
      r.schema.fieldNames.contains("format") &&
        r.getAs[Int]("format") == expected)

  /** Per-table-path monitors: appends and compactions of the SAME
    * table serialize within this JVM, so a segment written while a
    * compaction is between its canonical read and its swap cannot be
    * renamed into the backup and deleted (same-process exclusion
    * only — cross-process maintenance must be externally scheduled,
    * the standard offline-compaction contract, stated on
    * [[replaceTable]]). */
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(tablePath: String): Object =
    tableLocks.computeIfAbsent(tablePath, _ => new Object)

  private def bakPath(tablePath: String): Path =
    new Path(tablePath.stripSuffix("/") + "__swap_bak")

  /** Write `df` as segment `segId` of `tablePath` — IDEMPOTENT per
    * (tablePath, segId): the write targets the segment's own directory
    * with overwrite mode, so re-running the identical write replaces
    * the segment instead of appending beside it. An empty `df` still
    * writes a schema-bearing empty file (a freshly-built empty index
    * must read back as an empty table, not a read error).
    *
    * Appends must not target [[BaseSeg]] (that would silently replace
    * the whole initial build — [[writeBase]] is the rebuild). A
    * crashed compaction is HEALED before writing: if the real table
    * sits at `__swap_bak` (crash between the swap renames), writing
    * into a recreated `tablePath` would make the next recover delete
    * the backup — the entire pre-crash table — as stale. */
  def writeSegment(df: DataFrame, tablePath: String, segId: String): Unit =
    lockFor(tablePath).synchronized {
      require(segId.matches(SegIdPattern),
        s"segment id must match $SegIdPattern: '$segId'")
      require(segId != BaseSeg,
        s"appends must not target the '$BaseSeg' segment — " +
          "writeBase performs a rebuild")
      val p = new Path(tablePath)
      val fs = p.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      Swap.recover(fs, p, bakPath(tablePath))
      writeRaw(df, tablePath, segId)
    }

  private def writeRaw(
      df: DataFrame, tablePath: String, segId: String): Unit =
    df.write.mode("overwrite").parquet(s"$tablePath/seg=$segId")

  /** Clear `tablePath` entirely and write `df` as its single
    * [[BaseSeg]] segment — the full-build form (a plain segment write
    * on a dirty path would leave stale sibling segments or, worse,
    * root files from a pre-segment layout beside partition dirs,
    * which breaks partition discovery). A leftover swap backup is
    * cleared too: the rebuild supersedes whatever state a crashed
    * compaction left behind. */
  def writeBase(df: DataFrame, tablePath: String): Unit =
    lockFor(tablePath).synchronized {
      val p = new Path(tablePath)
      val fs = p.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      val bak = bakPath(tablePath)
      if (fs.exists(bak) && !fs.delete(bak, true))
        throw new Swap.SwapFailedException(s"could not clear $bak")
      if (fs.exists(p) && !fs.delete(p, true))
        throw new Swap.SwapFailedException(s"could not clear $tablePath")
      writeRaw(df, tablePath, BaseSeg)
    }

  /** Replace the whole (multi-segment) table with the single-segment
    * canonical form produced by `canonical` (a function of the current
    * table contents), under the crash-safe [[Swap]] protocol: readers
    * see the old table or the new one, never halves; an interrupted
    * prior replace is healed first. The `seg` partition column is
    * dropped from the frame `canonical` receives.
    *
    * Writer exclusion: appends and compactions of the same table
    * serialize within this JVM (the shared per-path monitor — a
    * segment appended between the canonical read and the swap would
    * otherwise ride the old table into the backup and be deleted).
    * ACROSS processes that exclusion must be operational: run
    * compaction when no other process appends to the index, the
    * standard offline-compaction contract. */
  def replaceTable(
      spark: SparkSession,
      tablePath: String)(canonical: DataFrame => DataFrame): Unit =
    lockFor(tablePath).synchronized {
      val p = new Path(tablePath)
      val tmp = new Path(tablePath.stripSuffix("/") + "__swap_tmp")
      val bak = bakPath(tablePath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Swap.recover(fs, p, bak)
      if (fs.exists(tmp) && !fs.delete(tmp, true))
        throw new Swap.SwapFailedException(s"could not clear stale $tmp")
      canonical(spark.read.parquet(tablePath).drop("seg"))
        .write.parquet(s"$tmp/seg=$BaseSeg")
      Swap.replace(fs, p, tmp, bak)
    }
}
