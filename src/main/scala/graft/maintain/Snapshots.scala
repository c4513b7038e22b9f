package graft.maintain

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot isolation + time travel for parquet tables — the
  * lakehouse-table-format concern the reference names ("iceberg") but
  * never implements (its `create_iceberg_table` writes a plain
  * `data.parquet`; the pyiceberg REST catalog import is never
  * connected — `iceberg_exploration.py:65-80,165-186`). At 100 TB a
  * real deployment wants exactly three properties from the format
  * layer, and this module provides them on raw Hadoop-FS + parquet
  * primitives, consistent with the repo's Manifest/Swap/Segments
  * stack:
  *
  *   1. '''Atomic commits''': writers never mutate data in place —
  *      every commit writes its rows into a fresh immutable
  *      `data/batch-<uuid>` directory, then CLAIMS its version by
  *      atomically renaming a fully-written manifest directory to
  *      `_snapshots/v<N>`. Rename-if-absent is the arbiter: two racing
  *      committers both write side files, exactly one rename wins, the
  *      loser re-reads the head and retries against the NEW parent
  *      (optimistic concurrency, the Iceberg/Delta commit protocol).
  *      A crash before the rename leaves only invisible orphans — the
  *      table's readable state is never touched.
  *   2. '''Snapshot-isolated reads''': a reader resolves the head
  *      version ONCE, then plans only that manifest's file list —
  *      concurrent commits (which only ADD files and manifests) cannot
  *      change or tear what it sees. Readers of version N are immune
  *      to everything after N by construction.
  *   3. '''Time travel''': every version's manifest (tiny parquet: one
  *      row per data file + commit metadata) persists until expired,
  *      so `readVersion(v)` / `readAsOf(ts)` replay any retained
  *      state; `rollback(v)` restores an old state AS A NEW VERSION
  *      (never destructive — an audited un-delete); `expire` retires
  *      old manifests and deletes only data batches no retained
  *      version references.
  *
  * Scale shape: a commit's cost is its own data write + one tiny
  * manifest (O(files-in-commit) rows); resolving the head lists one
  * `_snapshots/` directory (O(retained versions) — bounded by
  * `expire`, the same lifecycle as serving-index compaction); reads
  * plan `spark.read.parquet(files…)` so all parquet pushdown/pruning
  * applies unchanged. Nothing here scans data to commit — the 100 TB
  * posture is metadata-only commits over immutable files, which is
  * the entire point of a table format.
  *
  * Cross-process contract: the rename arbiter IS cross-process safe
  * (both committers land a version; the loser's retry re-parents) —
  * unlike the serving-index append lock, snapshots need no external
  * scheduling. `expire` is the one offline op: run it when no reader
  * is pinned to a version being retired (standard retention-window
  * operations, stated on [[expire]]).
  */
object Snapshots {

  /** Operation labels recorded in each manifest. */
  val OpCreate = "create"
  val OpAppend = "append"
  val OpOverwrite = "overwrite"
  val OpRollback = "rollback"

  private val SnapDir = "_snapshots"
  private val DataDir = "data"

  final class CommitConflictException(msg: String)
    extends java.io.IOException(msg)
  final class NoSuchVersionException(msg: String)
    extends java.util.NoSuchElementException(msg)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v")) name.drop(1).toLongOption else None

  /** All committed versions at `path`, ascending — a manifest counts
    * only once fully committed (the rename is atomic, so a listed
    * `v<N>` directory is always complete). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val dir = new Path(s"$path/$SnapDir")
    val f = fs(spark, path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .flatMap(st => versionOf(st.getPath.getName))
      .sorted
  }

  def exists(spark: SparkSession, path: String): Boolean =
    versions(spark, path).nonEmpty

  private def manifestDf(spark: SparkSession, path: String,
      v: Long): DataFrame = {
    val p = s"$path/$SnapDir/v$v"
    if (!fs(spark, path).exists(new Path(p)))
      throw new NoSuchVersionException(
        s"no snapshot v$v at $path (have: " +
          s"${versions(spark, path).mkString(",")})")
    spark.read.parquet(p)
  }

  /** ONE multi-path read over every retained manifest — the same
    * O(versions)-Spark-jobs trap SnapshotScaleProbe caught in the
    * replay check applies to any per-version loop; mergeSchema
    * tolerates manifests from before a column existed. */
  private def allManifests(
      spark: SparkSession, path: String, vs: Seq[Long]): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(vs.map(v => s"$path/$SnapDir/v$v"): _*)

  /** One row per retained version: (version, ts_ms, operation,
    * n_files, parent), ascending — the audit surface (`history` in
    * the CLI). One job regardless of version count. */
  def history(spark: SparkSession, path: String): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no snapshot table at $path")
    allManifests(spark, path, vs)
      .groupBy("version", "ts_ms", "operation", "parent")
      .agg(count(lit(1)).as("n_files"))
      .select("version", "ts_ms", "operation", "parent", "n_files")
      .orderBy("version")
  }

  /** A data file plus its optional per-file min/max over any number
    * of numeric stat columns — the Iceberg-manifest file-skipping
    * shape (manifest grain: one row per (file, stat_col); a file with
    * no stats carries one null-stat row). Files without stats for the
    * probed column are always read (unknown = candidate, the
    * [[Manifest]] append-safety rule). */
  final case class FileEntry(
      file: String,
      stats: Map[String, (Double, Double)] = Map.empty)

  /** Write `df`'s rows as a fresh immutable data batch; returns one
    * [[FileEntry]] per written file. With `statsCols` set, per-file
    * min/max over EVERY listed column are computed in ONE scan of the
    * just-written batch (grouped on `_metadata.file_path` —
    * commit-local cost, never a table scan) so later reads can skip
    * files by range on any of them. */
  private def writeBatch(df: DataFrame, path: String,
      statsCols: Seq[String] = Seq.empty): Seq[FileEntry] = {
    val batch = s"$path/$DataDir/batch-" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(16)
    df.write.parquet(batch) // fresh dir: no overwrite semantics needed
    val spark = df.sparkSession
    val f = fs(spark, path)
    val paths = f.listStatus(new Path(batch)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    if (statsCols.isEmpty) paths.map(FileEntry(_))
    else {
      // keyed on the scheme-less URI path: _metadata.file_path is a
      // full URI (file:///…) while the listing yields Path strings —
      // normalizing both sides makes this an exact map lookup
      val aggs = statsCols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"__lo_$c"),
        max(col(c).cast("double")).as(s"__hi_$c")))
      val stats = spark.read.parquet(batch)
        .groupBy(col("_metadata.file_path").as("__f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map { r =>
          val per = statsCols.zipWithIndex.flatMap { case (c, i) =>
            val lo = Option(r.get(1 + 2 * i)).map(_.asInstanceOf[Double])
            val hi = Option(r.get(2 + 2 * i)).map(_.asInstanceOf[Double])
            (lo, hi) match {
              case (Some(l), Some(h)) => Some(c -> (l, h))
              case _                  => None // all-null column: no stat
            }
          }.toMap
          new Path(r.getString(0)).toUri.getPath -> per
        }
        .toMap
      paths.map { p =>
        FileEntry(p,
          stats.getOrElse(new Path(p).toUri.getPath, Map.empty))
      }
    }
  }

  /** Same-JVM commit serialization per table path (two threads of one
    * driver committing concurrently — the common case — never even
    * reach the rename contention). Cross-PROCESS committers are
    * arbitrated by [[claimVersion]]'s no-overwrite rename. */
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(path: String): Object =
    commitLocks.computeIfAbsent(path, _ => new Object)

  /** The cross-process atomic arbiter: rename `tmp` to `dest` FAILING
    * if `dest` exists. Plain `FileSystem.rename` is the WRONG tool —
    * on a POSIX-backed FS renaming onto an existing directory moves
    * the source INSIDE it (both racers would think they won; the
    * loser's commit silently vanishes — caught by SnapshotsSpec's
    * race test). `FileContext.rename` without the OVERWRITE option
    * enforces fail-on-existing; on HDFS-semantics filesystems the
    * check-and-rename is one atomic server-side operation (the
    * guarantee Iceberg/Delta commit protocols build on). */
  private[graft] def claimVersion(
      spark: SparkSession, tmp: Path, dest: Path): Boolean = {
    val ctx = org.apache.hadoop.fs.FileContext.getFileContext(
      dest.toUri, spark.sparkContext.hadoopConfiguration)
    try { ctx.rename(tmp, dest); true }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case e: java.io.IOException
          if Option(e.getMessage).exists(_.contains("exists")) => false
    }
  }

  /** The version that already carries `commitKey`, if any — the
    * idempotency probe for replayed commits. ONE multi-path read over
    * every retained manifest (tiny files), not a Spark job per
    * version: the per-version loop measured 5 s at 51 retained
    * versions (SnapshotScaleProbe) where this reads in one job.
    * Retention must outlast the replay window, stated on
    * [[commitAppend]]. */
  private def versionOfCommitKey(
      spark: SparkSession, path: String, commitKey: String): Option[Long] = {
    val vs = versions(spark, path)
    if (vs.isEmpty) return None
    val m = allManifests(spark, path, vs)
    if (!m.columns.contains("commit_key")) None
    else Option(
        m.filter(col("commit_key") === commitKey)
          .agg(max(col("version"))).head().get(0))
      .map(_.asInstanceOf[Long])
  }

  /** Commit `files` as version `head + 1`, retrying against the new
    * head on a lost race. The manifest is written COMPLETELY to a tmp
    * directory, then claimed via [[claimVersion]]. A `commitKey`
    * makes the commit IDEMPOTENT: a commit whose key already sits in
    * a retained manifest returns that version instead of applying
    * again — the Delta txn-appId/version pattern that turns
    * foreachBatch's at-least-once replay into exactly-once. */
  @annotation.tailrec
  private def commit(
      spark: SparkSession,
      path: String,
      files: Seq[FileEntry],
      op: String,
      parentFiles: Long => Seq[FileEntry],
      commitKey: Option[String] = None,
      retries: Int = 20): Long = {
    val claimed = lockFor(path).synchronized {
      // replayed keyed commit: already applied — converge to that
      // version, don't double-append (the replay's re-written data
      // batch is invisible and expire-sweepable)
      val replayed = commitKey.flatMap(versionOfCommitKey(spark, path, _))
      if (replayed.isDefined) replayed
      else {
      val head = versions(spark, path).lastOption.getOrElse(0L)
      val v = head + 1
      val all = parentFiles(head) ++ files
      import spark.implicits._
      val manifestRows = all.flatMap { e =>
        if (e.stats.isEmpty)
          Seq((e.file, null: String,
            null: java.lang.Double, null: java.lang.Double))
        else e.stats.toSeq.map { case (c, (lo, hi)) =>
          (e.file, c, Double.box(lo), Double.box(hi))
        }
      }
      val manifest = manifestRows
        .toDF("file", "stat_col", "stat_min", "stat_max")
        .select(col("file"), col("stat_col").cast("string"),
          col("stat_min").cast("double"), col("stat_max").cast("double"))
        .withColumn("version", lit(v))
        .withColumn("ts_ms", lit(System.currentTimeMillis()))
        .withColumn("operation", lit(op))
        .withColumn("parent", lit(head))
        // cast: a keyless commit must write a NULL STRING, not VOID —
        // VOID cannot schema-merge with keyed manifests' STRING
        .withColumn("commit_key", lit(commitKey.orNull).cast("string"))
      val f = fs(spark, path)
      val tmp = new Path(s"$path/$SnapDir/.tmp-v$v-" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(12))
      manifest.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val dest = new Path(s"$path/$SnapDir/v$v")
      if (claimVersion(spark, tmp, dest)) Some(v)
      else { f.delete(tmp, true); None }
      }
    }
    claimed match {
      case Some(v) => v
      case None =>
        // a FOREIGN process claimed this version between our head read
        // and our rename — re-parent against the new head and retry
        if (retries <= 0)
          throw new CommitConflictException(
            s"lost the commit race at $path too many times — " +
              "a runaway committer loop?")
        commit(spark, path, files, op, parentFiles, commitKey,
          retries - 1)
    }
  }

  private def entriesOf(spark: SparkSession, path: String,
      v: Long): Seq[FileEntry] = {
    val m = manifestDf(spark, path, v)
    val hasStats = m.columns.contains("stat_col")
    val proj =
      if (hasStats) m.select("file", "stat_col", "stat_min", "stat_max")
      else m.select(col("file"), lit(null).cast("string"),
        lit(null).cast("double"), lit(null).cast("double"))
    proj.collect().toSeq
      .groupBy(_.getString(0))
      .map { case (file, rows) =>
        val stats = rows.flatMap { r =>
          if (r.isNullAt(1) || r.isNullAt(2) || r.isNullAt(3)) None
          else Some(r.getString(1) -> (r.getDouble(2), r.getDouble(3)))
        }.toMap
        FileEntry(file, stats)
      }.toSeq
  }

  private def filesOf(spark: SparkSession, path: String,
      v: Long): Seq[String] =
    entriesOf(spark, path, v).map(_.file)

  /** Create the snapshot table (version 1). Fails if one exists —
    * `commitOverwrite` is the explicit replace. `commitKey` stamps v1
    * so a bootstrap-batch replay (stream crashed between create and
    * checkpoint) converges through the keyed-append path instead of
    * double-applying batch 0. */
  def create(df: DataFrame, path: String,
      commitKey: Option[String] = None,
      statsCols: Seq[String] = Seq.empty): Long = {
    val spark = df.sparkSession
    require(!exists(spark, path),
      s"snapshot table already exists at $path — use commitAppend/" +
        "commitOverwrite")
    val files = writeBatch(df, path, statsCols)
    commit(spark, path, files, OpCreate, _ => Seq.empty, commitKey)
  }

  /** Append `df` as a new version: new files + every parent file.
    *
    * `commitKey` (optional) makes the append EXACTLY-ONCE under
    * replay: a key already present in a retained manifest returns its
    * version without applying again — the Delta txnAppId/txnVersion
    * dedup pattern; the streaming arm passes
    * `sha(checkpointDir)_batchId`. Retention contract: [[expire]]
    * must keep at least the replay window's manifests (a replay older
    * than every retained manifest re-applies); keep `keepLast` above
    * the stream's maximum replayable depth (1 batch for foreachBatch). */
  def commitAppend(
      df: DataFrame, path: String,
      commitKey: Option[String] = None,
      statsCols: Seq[String] = Seq.empty): Long = {
    val spark = df.sparkSession
    require(exists(spark, path), s"no snapshot table at $path")
    // the replay pre-check before writeBatch keeps a replayed call
    // from littering a second (invisible) data batch in the common
    // case; the in-lock re-check in commit() remains the authority
    commitKey.flatMap(versionOfCommitKey(spark, path, _)) match {
      case Some(v) => v
      case None =>
        val files = writeBatch(df, path, statsCols)
        commit(spark, path, files, OpAppend,
          parent => entriesOf(spark, path, parent), commitKey)
    }
  }

  /** Logically replace the table's content as a new version; prior
    * versions stay readable until expired. */
  def commitOverwrite(df: DataFrame, path: String,
      statsCols: Seq[String] = Seq.empty): Long = {
    val spark = df.sparkSession
    require(exists(spark, path), s"no snapshot table at $path")
    val files = writeBatch(df, path, statsCols)
    commit(spark, path, files, OpOverwrite, _ => Seq.empty)
  }

  /** Restore version `v`'s content AS A NEW VERSION (audited
    * un-delete; nothing is removed). */
  def rollback(spark: SparkSession, path: String, v: Long): Long = {
    val files = entriesOf(spark, path, v) // throws on unknown v
    commit(spark, path, Seq.empty, OpRollback, _ => files)
  }

  /** Snapshot-isolated read of the current head: the version resolves
    * ONCE, then only its manifest's files are planned — concurrent
    * commits cannot change or tear the result. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no snapshot table at $path")
    readVersion(spark, path, vs.last)
  }

  /** Time travel to an exact retained version. */
  def readVersion(spark: SparkSession, path: String, v: Long): DataFrame = {
    val files = filesOf(spark, path, v)
    if (files.isEmpty)
      // an all-empty version (empty create/overwrite) still has a
      // schema-bearing empty parquet file, so this only guards a
      // manifest with zero rows — impossible via the writers above
      throw new NoSuchVersionException(s"version $v at $path lists no files")
    spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** FILE-SKIPPING time travel: plan only version `v`'s files whose
    * recorded `[stat_min, stat_max]` range (written by a commit with
    * `statsCol = Some(whereCol)`) overlaps `[lo, hi]` — the
    * Iceberg-manifest pruning shape, resolved from the tiny manifest
    * with NO data scan. Files without stats (older commits, other
    * stat columns, all-null stats) are always planned — unknown =
    * candidate, so the result is a SUPERSET of the exact range rows
    * and callers apply the real predicate on top (which Catalyst also
    * pushes into the surviving files' row groups). At 100 TB this is
    * the difference between touching one day's files and the table. */
  def readVersionWhere(
      spark: SparkSession, path: String, v: Long,
      whereCol: String, lo: Double, hi: Double): DataFrame = {
    require(lo <= hi, s"empty range: [$lo, $hi]")
    val entries = entriesOf(spark, path, v)
    if (entries.isEmpty)
      throw new NoSuchVersionException(s"version $v at $path lists no files")
    val kept = entries.filter { e =>
      e.stats.get(whereCol) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None           => true // unknown = candidate
      }
    }
    if (kept.isEmpty)
      // every file provably outside the range: an empty frame with
      // the version's schema, not an error
      readVersion(spark, path, v).limit(0)
    else spark.read.option("mergeSchema", "true")
      .parquet(kept.map(_.file): _*)
  }

  /** Time travel to the newest version committed at or before
    * `tsMs` (epoch millis). */
  def readAsOf(spark: SparkSession, path: String, tsMs: Long): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no snapshot table at $path")
    // one job over all retained manifests, not one per version
    val at = Option(
        allManifests(spark, path, vs)
          .filter(col("ts_ms") <= tsMs)
          .agg(max(col("version"))).head().get(0))
      .map(_.asInstanceOf[Long])
    at match {
      case Some(v) => readVersion(spark, path, v)
      case None => throw new NoSuchVersionException(
        s"no version at or before ts_ms=$tsMs at $path")
    }
  }

  /** Incremental (CDC-style) read: the rows ADDED between `fromV`
    * (exclusive) and `toV` (inclusive) — exactly the files in `toV`'s
    * manifest that `fromV`'s lacks. For append-only tables this is
    * the changelog a downstream consumer tails instead of re-reading
    * the world: resolving it is a manifest diff (metadata only), and
    * the read plans only the delta files. An overwrite/compact in the
    * range fails loudly — its new files are not row-level additions,
    * and serving them as a delta would double-count rewritten rows. */
  def readAppendedBetween(
      spark: SparkSession, path: String,
      fromV: Long, toV: Long): DataFrame = {
    require(fromV < toV, s"fromV ($fromV) must be < toV ($toV)")
    val rewrites = history(spark, path)
      .filter(col("version") > fromV && col("version") <= toV)
      .filter(col("operation")
        .isin(OpOverwrite, OpRollback, "compact", "upsert"))
      .select("version", "operation")
      .collect()
    require(rewrites.isEmpty,
      s"readAppendedBetween($fromV, $toV] crosses non-append commits " +
        rewrites.map(r => s"v${r.getLong(0)}=${r.getString(1)}")
          .mkString("(", ", ", ")") +
        " — a rewrite's files are not row-level additions")
    val before = filesOf(spark, path, fromV).toSet
    val delta = filesOf(spark, path, toV).filterNot(before)
    if (delta.isEmpty)
      // schema-stable empty delta: zero-row frame with toV's schema
      readVersion(spark, path, toV).limit(0)
    else spark.read.parquet(delta: _*)
  }

  /** Keyed MERGE as a COMMIT: [[Upsert.mergeFrames]] semantics
    * (latest `(versionCol, tiebreakCol)` per key wins across head ∪
    * updates) committed as a new version (operation "upsert") — the
    * time-travelable MERGE: every pre-merge state stays readable, a
    * bad upsert is one `rollback` away, and a reader racing the merge
    * sees old-or-new (snapshot isolation doing [[Upsert.upsertPath]]'s
    * swap work). Cost: one hash shuffle on the key over head ∪
    * updates + the rewrite — the unpartitioned-merge shape; at 100 TB
    * partition the snapshot table and merge per touched partition. */
  def commitUpsert(
      updates: DataFrame,
      path: String,
      keyCols: Seq[String],
      versionCol: String,
      tiebreakCol: String): Long = {
    val spark = updates.sparkSession
    require(exists(spark, path), s"no snapshot table at $path")
    val merged = Upsert.mergeFrames(
      read(spark, path), updates, keyCols, versionCol, tiebreakCol)
    val files = writeBatch(merged, path)
    commit(spark, path, files, "upsert", _ => Seq.empty)
  }

  /** Small-file maintenance as a COMMIT: rewrite the head's content
    * into one fresh batch of `targetFiles` files and commit it as a
    * new version (operation "compact"). Nothing is deleted — prior
    * versions still read their original files until [[expire]]; a
    * reader racing the compaction sees old-or-new, never a mix (the
    * snapshot-isolation property doing the Swap protocol's job). */
  def compact(spark: SparkSession, path: String,
      targetFiles: Int = 8): Long = {
    require(targetFiles >= 1, s"targetFiles must be ≥ 1: $targetFiles")
    require(exists(spark, path), s"no snapshot table at $path")
    val files = writeBatch(
      read(spark, path).repartition(targetFiles), path)
    commit(spark, path, files, "compact", _ => Seq.empty)
  }

  /** Z-CLUSTERED compaction as a COMMIT: the head's content rewritten
    * through [[Layout.zOrdered]] (approx-quantile z-key — safe at any
    * scale, no global ranking window) into `targetFiles` files, with
    * per-file min/max over `colA` recorded in the manifest — so after
    * this commit [[readVersionWhere]] on `colA` actually skips files
    * (an unclustered layout's per-file ranges all overlap; clustering
    * is what makes the recorded stats selective). Same non-destructive
    * versioned lifecycle as [[compact]]. */
  def compactZOrdered(
      spark: SparkSession, path: String,
      colA: String, colB: String,
      targetFiles: Int = 8): Long = {
    require(targetFiles >= 1, s"targetFiles must be ≥ 1: $targetFiles")
    require(exists(spark, path), s"no snapshot table at $path")
    val files = writeBatch(
      Layout.zOrdered(read(spark, path), colA, colB, targetFiles),
      path, statsCols = Seq(colA, colB))
    commit(spark, path, files, "compact", _ => Seq.empty)
  }

  /** Retire all but the newest `keepLast` versions: their manifests
    * are deleted, then every `data/batch-*` directory no RETAINED
    * version references is removed. Retention-window contract: do not
    * expire versions a long-running reader may still be pinned to
    * (readers resolve files at plan time; standard table-format
    * operations guidance). Returns (versions dropped, data dirs
    * deleted). */
  def expire(spark: SparkSession, path: String,
      keepLast: Int = 2,
      orphanMinAgeMs: Long = 3600000L): (Int, Int) = {
    require(keepLast >= 1, s"keepLast must be ≥ 1: $keepLast")
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no snapshot table at $path")
    val drop = vs.dropRight(keepLast)
    val keep = vs.takeRight(keepLast)
    val f = fs(spark, path)
    // referenced batch dirs = parent dirs of every retained file
    val referenced = keep.flatMap(v => filesOf(spark, path, v))
      .map(fp => new Path(fp).getParent.toString).toSet
    drop.foreach(v => f.delete(new Path(s"$path/$SnapDir/v$v"), true))
    val dataDir = new Path(s"$path/$DataDir")
    // the age floor protects an IN-FLIGHT commit's just-written batch
    // (data landed, rename pending) from being swept as an orphan —
    // Iceberg's orphan-file cleanup makes the same time-based cut; a
    // crashed commit's batch becomes sweepable once it ages past it
    val cutoff = System.currentTimeMillis() - orphanMinAgeMs
    val orphans =
      if (!f.exists(dataDir)) Seq.empty
      else f.listStatus(dataDir).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("batch-") &&
          !referenced.contains(st.getPath.toString) &&
          st.getModificationTime <= cutoff)
    orphans.foreach(st => f.delete(st.getPath, true))
    (drop.size, orphans.size)
  }
}
