package graft.maintain

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max manifest — the metadata half of what table
  * formats (Iceberg manifests, Delta file stats) add over bare
  * parquet, rebuilt with plain Spark primitives.
  *
  * Parquet already keeps row-group min/max in each file's footer, and
  * Spark's reader uses them — but only AFTER listing every file and
  * reading every footer. At 100 TB (millions of files) the listing and
  * footer I/O dominate selective queries. A manifest is one small
  * parquet table of (file, per-column min/max, rows) that answers
  * "which files can contain rows in this range" with a single scan of
  * metadata — the reader then opens ONLY the overlapping files. On a
  * z-ordered or range-written table (maintain.Layout) per-file ranges
  * are tight and most files prune.
  *
  * The manifest lives under `<table>/_graft_manifest`: the leading
  * underscore keeps it invisible to Spark/Hadoop data discovery
  * (hidden-file convention), so plain readers of the table see no
  * change. Reference parity: iceberg_exploration.py's catalog/manifest
  * ambitions (`iceberg_exploration.py:65-80`) never materialized in
  * the reference; this is the working equivalent.
  *
  * Correctness contract (ManifestSpec): pruned-read(pred) ≡
  * full-read.filter(pred) for range predicates on manifested columns —
  * min/max pruning has no false negatives (a file is only skipped if
  * its range provably cannot overlap).
  */
object Manifest {

  val ManifestDir = "_graft_manifest"

  /** Build/refresh the manifest for `cols` of the parquet table at
    * `path`. One distributed scan of the manifested columns, one
    * shuffle keyed by file name (tiny: one row per file). */
  def build(spark: SparkSession, path: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "manifest needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"),
      max(col(c)).as(s"max_$c"))) :+ count(lit(1)).as("n_rows")
    spark.read.parquet(path)
      .select(input_file_name().as("file"),
        struct(cols.map(col): _*).as("v"))
      .select(col("file"), col("v.*"))
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // one row per data file — metadata-sized by definition
      .write.mode("overwrite")
      .parquet(s"$path/$ManifestDir")
  }

  /** The manifest table (throws if absent — call build first). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/$ManifestDir")

  /** Collected-manifest memo keyed by (qualified manifest dir,
    * modification time): [[build]] replaces the whole directory
    * (overwrite mode → fresh mtime), so the collected rows stay valid
    * while the same directory is in place. Bounded; cleared wholesale
    * past the cap. */
  private val manifestMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Long),
    (org.apache.spark.sql.types.StructType,
      Seq[org.apache.spark.sql.Row])]()
  private val ManifestMemoCap = 1024

  /** The manifest as a LOCAL relation of memoized rows: overlap
    * predicates still evaluate IN Spark SQL (the type-correct,
    * NaN-safe comparison ManifestSpec pins) but the optimizer folds
    * Filter-over-LocalRelation driver-side — so a pruned read (or a
    * [[graft.plans.ManifestPruneRule]] application during query
    * optimization) costs one FS stat instead of re-reading and
    * re-collecting the manifest parquet per query. Falls through to
    * the plain read's own error when no manifest exists. */
  private def manifestLocal(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val dir = new Path(s"$path/$ManifestDir")
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st =
      try f.getFileStatus(dir)
      catch { case _: java.io.FileNotFoundException =>
        return read(spark, path) }
    val key = (f.makeQualified(dir).toString, st.getModificationTime)
    val hit = manifestMemo.get(key)
    val (schema, rows) =
      if (hit != null) hit
      else {
        val df = read(spark, path)
        val collected = (df.schema, df.collect().toSeq)
        if (manifestMemo.size >= ManifestMemoCap) manifestMemo.clear()
        manifestMemo.put(key, collected)
        collected
      }
    spark.createDataFrame(rows.asJava, schema)
  }

  /** The manifested column set, recovered from the manifest's own
    * schema (min_<col> fields); None when no manifest exists. Layout
    * rewrites (compaction/z-order) capture this BEFORE their swap —
    * the manifest sits inside the table dir, so the swap carries it
    * away with the backup and the new layout needs a fresh build (a
    * stale manifest would point at files that no longer exist). */
  def columnsIfPresent(spark: SparkSession, path: String)
      : Option[Seq[String]] =
    if (!exists(spark, path)) None
    else Some(read(spark, path).schema.fieldNames.toSeq
      .filter(_.startsWith("min_")).map(_.stripPrefix("min_")))
      .filter(_.nonEmpty)

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(s"$path/$ManifestDir")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Data files currently on disk (hidden subtrees excluded), in the
    * same URI form `input_file_name()` records. */
  private def listDataFiles(spark: SparkSession, path: String)
      : Set[String] = {
    val root = new Path(path)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = f.makeQualified(root).toString
    val it = f.listFiles(root, true)
    val out = Set.newBuilder[String]
    while (it.hasNext) {
      val s = it.next()
      val rel = s.getPath.toString.stripPrefix(qualified).split('/')
      val hidden = rel.exists(seg =>
        seg.startsWith("_") || seg.startsWith("."))
      if (s.getPath.getName.endsWith(".parquet") && !hidden)
        out += s.getPath.toString
    }
    out.result()
  }

  /** Soft ceiling for the driver-side file-list envelope (entries, not
    * bytes). Above this, candidateFiles logs a warning: at ~150 bytes
    * per path string the driver holds ~1.5 GB of file names at 10 M
    * entries, and the right move is a coarser layout (compaction) or a
    * partition-level manifest, not a bigger driver. */
  val EnvelopeWarnEntries: Long = 10L * 1000 * 1000

  /** Warn (once per call site that trips it) when a manifest/listing
    * is about to hold `nEntries` paths on the driver. Returns whether
    * it warned — the test seam for the envelope guard. */
  private[graft] def checkDriverEnvelope(
      nEntries: Long,
      what: String,
      threshold: Long = EnvelopeWarnEntries): Boolean = {
    val over = nEntries > threshold
    if (over)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"$what holds $nEntries entries on the driver (> $threshold); " +
          "at ~150 B/path this is GBs of driver heap — compact the " +
          "table or split the manifest per partition")
    over
  }

  /** Files whose [min,max] range on `column` may overlap [lo, hi].
    * Conservative in BOTH directions a manifest can go stale:
    *  - NULL stats (all-null file) are kept;
    *  - files on disk but ABSENT from the manifest (appended since the
    *    last build) are always candidates — otherwise a pruned read
    *    would silently drop freshly-appended rows;
    *  - manifest rows for files no longer on disk (replaced layout)
    *    are dropped rather than passed to the reader.
    * The listing costs one FS scan — the same metadata pass any read
    * of the table performs.
    *
    * DRIVER-SIDE ENVELOPE: the manifest rows and the FS listing are
    * both collected to the driver — the same shape (and cost class) as
    * Spark's own InMemoryFileIndex, O(#files) small strings, NOT
    * O(data). That is the right trade until file counts reach the
    * multi-million range; past [[EnvelopeWarnEntries]] a warning fires
    * (see checkDriverEnvelope) and the table wants compaction or a
    * per-partition manifest instead. */
  def candidateFiles(
      spark: SparkSession,
      path: String,
      column: String,
      lo: Any,
      hi: Any): Seq[String] =
    candidateFilesBounded(spark, path, Seq((column, Some(lo), Some(hi))))

  /** [[candidateFiles]] generalized to a CONJUNCTION of (column,
    * optional lo, optional hi) bounds — the shape the optimizer rule
    * ([[graft.plans.ManifestPruneRule]]) extracts from a Filter. A
    * file survives only if every bounded column's [min,max] range may
    * overlap its bound (one-sided bounds leave the other side open).
    * One FS listing and one manifest read are shared across all
    * columns; same conservative staleness contract as
    * [[candidateFiles]]. */
  def candidateFilesBounded(
      spark: SparkSession,
      path: String,
      bounds: Seq[(String, Option[Any], Option[Any])],
      inLists: Seq[(String, Seq[Any])] = Seq.empty): Seq[String] = {
    require(bounds.nonEmpty || inLists.nonEmpty,
      "at least one column bound or IN-list required")
    // input_file_name() records "file:///x" where Path prints
    // "file:/x" — normalize through Path before any comparison
    def norm(uri: String): String = new Path(uri).toString
    val onDisk = listDataFiles(spark, path)
    checkDriverEnvelope(onDisk.size.toLong, s"file listing of $path")
    val mf = manifestLocal(spark, path)
    val known = mf
      .select("file").collect().map(r => norm(r.getString(0))).toSet
    checkDriverEnvelope(known.size.toLong, s"manifest of $path")
    // range tests done in Spark SQL for type-correct comparison
    val rangePreds = bounds
      .map { case (c, lo, hi) =>
        col(s"min_$c").isNull || col(s"max_$c").isNull ||
          (lo.map(v => col(s"max_$c") >= lit(v)).getOrElse(lit(true)) &&
            hi.map(v => col(s"min_$c") <= lit(v)).getOrElse(lit(true)))
      }
    // IN-list: a file survives when AT LEAST ONE non-null listed value
    // can sit in its [min, max] range (null elements match no row, so
    // dropping them is exact; an all-null list degrades to no pruning)
    val inPreds = inLists.map { case (c, vs0) =>
      val vs = vs0.filter(_ != null)
      if (vs.isEmpty) lit(true)
      else col(s"min_$c").isNull || col(s"max_$c").isNull ||
        vs.map(v => col(s"min_$c") <= lit(v) && col(s"max_$c") >= lit(v))
          .reduce(_ || _)
    }
    val pred = (rangePreds ++ inPreds).reduce(_ && _)
    val overlapFiles = mf.filter(pred)
      .select("file")
      .collect().map(r => norm(r.getString(0))).toSeq
      .filter(onDisk.contains)
    val unknown = (onDisk -- known).toSeq.sorted
    overlapFiles ++ unknown
  }

  /** Read only the files that can satisfy `lo <= column <= hi`, with
    * the residual filter applied (file pruning is necessary, not
    * sufficient). Returns an empty frame with the right schema when
    * nothing overlaps. */
  def readPruned(
      spark: SparkSession,
      path: String,
      column: String,
      lo: Any,
      hi: Any): DataFrame = {
    val files = candidateFiles(spark, path, column, lo, hi)
    val base =
      if (files.isEmpty)
        spark.read.parquet(path).limit(0)
      // basePath keeps partition-directory columns reconstructable
      // when reading an explicit file subset of a partitioned table
      else spark.read.option("basePath", path).parquet(files: _*)
    base.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }
}
