package graft.tools

import graft.GraftSession
import graft.maintain.Snapshots

/** Does the snapshot layer's "metadata-only commits" claim hold as
  * the table grows? The 100 TB posture argues a commit costs its own
  * data write + one tiny manifest, independent of table size, and
  * that head resolution is O(retained versions). Measured here:
  *
  *   - commit latency at version 2, 25, 50 over a table whose
  *     manifests accumulate files (every append inherits the parent
  *     file list, so v50's manifest lists ~50× v1's files — the
  *     worst-case manifest growth shape);
  *   - head-read planning cost at v2 vs v50 (file-list resolution +
  *     spark.read over N files);
  *   - keyed-append replay probe cost at v50 (the exactly-once check
  *     reads one tiny manifest per retained version);
  *   - expire wall time dropping 48 versions.
  *
  * Run: `sbt "runMain graft.tools.SnapshotScaleProbe"`.
  * Findings recorded in SCALE_PROBES.md (r16).
  */
object SnapshotScaleProbe {

  private def timed(b: => Unit): Double = {
    val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val tbl = java.nio.file.Files
      .createTempDirectory("snap_scale").toString + "/t"
    def batch(i: Int) = spark.range(i * 10000L, (i + 1) * 10000L)
      .toDF("id").repartition(8) // 8 files per commit
    val tCreate = timed(Snapshots.create(batch(0), tbl))
    println(f"PROBE snap_scale create sec=$tCreate%.2f")
    var t2 = -1.0; var t25 = -1.0; var t50 = -1.0
    for (i <- 1 until 50) {
      val t = timed(Snapshots.commitAppend(batch(i), tbl))
      if (i == 1) t2 = t; if (i == 24) t25 = t; if (i == 49) t50 = t
    }
    println(f"PROBE snap_scale commit_v2=$t2%.2f commit_v25=$t25%.2f " +
      f"commit_v50=$t50%.2f (files in head manifest: " +
      s"${Snapshots.history(spark, tbl).orderBy(org.apache.spark.sql
        .functions.col("version").desc).select("n_files")
        .head().getLong(0)})")

    def readHead(): Unit = { Snapshots.read(spark, tbl).count(); () }
    readHead() // warm
    val tRead = (1 to 3).map(_ => timed(readHead())).min
    println(f"PROBE snap_scale head_read_v50 sec=$tRead%.2f " +
      f"rows=${Snapshots.read(spark, tbl).count()}")

    // replay probe: keyed append whose key is already retained
    Snapshots.commitAppend(batch(50), tbl, commitKey = Some("ck_probe"))
    val tReplay = timed(
      Snapshots.commitAppend(batch(50), tbl, commitKey = Some("ck_probe")))
    println(f"PROBE snap_scale keyed_replay_noop sec=$tReplay%.2f")

    val tExpire = timed(Snapshots.expire(spark, tbl, keepLast = 2,
      orphanMinAgeMs = 0L))
    println(f"PROBE snap_scale expire_to_2 sec=$tExpire%.2f " +
      s"versions_left=${Snapshots.versions(spark, tbl)}")
    spark.stop()
  }
}
