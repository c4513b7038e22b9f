package graft.maintain

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file maintenance (reference simple_iceberg_exploration.py:188-304):
  * delta-append fragmentation and its cure, compaction — plus the
  * storage metrics the reference reports (StorageMetrics,
  * simple_iceberg_exploration.py:25-39,115-186).
  *
  * At scale this is a scheduled maintenance job, not a query-path
  * concern; AQE partition coalescing already prevents the engine from
  * CREATING fragments during normal writes.
  */
object Compaction {

  final case class StorageStats(files: Int, bytes: Long)

  final case class CompactionResult(
      before: StorageStats,
      after: StorageStats,
      reduction: Double)

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Data-file count + bytes under a table path (driver-side metadata
    * listing, mirrors StorageMetrics). */
  def stats(spark: SparkSession, path: String): StorageStats = {
    val f = fs(spark, path)
    val it = f.listFiles(new Path(path), true)
    var files = 0
    var bytes = 0L
    while (it.hasNext) {
      val s = it.next()
      // skip hidden subtrees (e.g. _graft_manifest) — they are
      // metadata, invisible to readers, and must not skew layout stats
      val rel = s.getPath.toString.stripPrefix(
        f.makeQualified(new Path(path)).toString).split('/')
      val hidden = rel.exists(seg =>
        seg.startsWith("_") || seg.startsWith("."))
      if (s.getPath.getName.endsWith(".parquet") && !hidden) {
        files += 1
        bytes += s.getLen
      }
    }
    StorageStats(files, bytes)
  }

  /** Test harness: write `df` deliberately fragmented into n files
    * (reference ST3, simple_iceberg_exploration.py:262-272). */
  def fragment(df: DataFrame, path: String, nFiles: Int): Unit =
    df.repartition(nFiles).write.mode("overwrite").parquet(path)

  /** Append a small delta batch (reference ST1 delta simulation,
    * simple_iceberg_exploration.py:188-247). */
  def appendDelta(delta: DataFrame, path: String): Unit =
    delta.write.mode("append").parquet(path)

  /** Rewrite a fragmented table into `targetFiles` files. Writes to a
    * sibling temp dir then swaps via FS rename — the table is never
    * read and overwritten in the same job (Spark cannot overwrite its
    * own input), and readers see either old or new layout, not halves. */
  def compact(spark: SparkSession, path: String, targetFiles: Int)
      : CompactionResult = {
    val f = fs(spark, path)
    val dest = new Path(path)
    val old = new Path(path.stripSuffix("/") + "_precompact")
    Swap.recover(f, dest, old) // heal an interrupted prior compact first
    // capture manifest columns BEFORE the swap moves the manifest away
    // with the backup — the new layout needs a fresh build
    val manifestCols = Manifest.columnsIfPresent(spark, path)
    val before = stats(spark, path)
    val tmp = path.stripSuffix("/") + "_compacting"
    spark.read.parquet(path)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp)
    Swap.replace(f, dest, new Path(tmp), old)
    manifestCols.foreach(cols => Manifest.build(spark, path, cols))
    val after = stats(spark, path)
    CompactionResult(before, after,
      if (before.files == 0) 0.0
      else 1.0 - after.files.toDouble / before.files)
  }
}
