package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.maintain.Snapshots

/** Measures the claim on [[Snapshots.readChangeFeed]]: serving a
  * commit's row-level changes costs what the commit TOUCHED, not the
  * table — i.e. the feed of a file-scoped DELETE stays FLAT as the
  * table grows (its diff reads one file pair), while the feed of a
  * full-rewrite MERGE grows with the two versions it must diff
  * (inherent to row-serving a total rewrite — the documented
  * degenerate case, not the production path).
  *
  * Method (solo, no concurrent Spark JVMs): for table sizes N ∈
  * {1M, 4M, 16M} rows range-clustered into 32 id-stat'd files, time
  * (a) the feed of a `commitDeleteWhere` hitting 1k keys inside ONE
  * file's range and (b) the feed of a full `commitUpsert` updating
  * the same 1k keys, both drained by the same count+sum aggregate.
  * The planned input-file count of the scoped feed is recorded so the
  * flatness claim is tied to the mechanism (one touched file pair),
  * not inferred.
  */
object CdfScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def drain(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(lit(1)), sum($"id")).head().getLong(0)
    var warmed = false
    val made = scala.collection.mutable.Buffer.empty[String]
    for (n <- Seq(100000L, 1000000L, 4000000L, 16000000L)) {
      def fresh(tag: String): String = {
        val parent = java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get("target").toAbsolutePath)
        val base = java.nio.file.Files.createTempDirectory(
          parent, s"cdf-probe-$tag")
        made += base.toString
        val dir = base.toString + "/t"
        val df = spark.range(n).select(
            $"id", ($"id" * 7 % 1000).cast("double").as("v"),
            lit(1L).as("ver"), lit(0L).as("tb"))
          .repartitionByRange(32, $"id")
        Snapshots.create(df, dir, statsCols = Seq("id"))
        dir
      }

      // (a) scoped DELETE: 1k contiguous keys inside one file's range
      val delTbl = fresh("del")
      Snapshots.commitDeleteWhere(spark, delTbl, "id", 1000, 1999)
      // plan once OUTSIDE the timed block (the full-merge arm times
      // only its drain — same-shape timing or the ratio lies), and
      // read the planned-file pin from the same frame untimed
      val feedDelF = Snapshots.readChangeFeed(spark, delTbl, 1L, 2L)
      val (nDelRows, tDel) = timed(drain(feedDelF))
      val nDelFiles = feedDelF.inputFiles.length

      // (b) full-rewrite MERGE over the same 1k keys
      val upTbl = fresh("up")
      Snapshots.commitUpsert(
        spark.range(1000).select(($"id" + 1000).as("id"),
          lit(-1.0).as("v"), lit(2L).as("ver"), lit(0L).as("tb")),
        upTbl, Seq("id"), "ver", "tb")
      val (feedUp, tUp) = timed(drain(
        Snapshots.readChangeFeed(spark, upTbl, 1L, 2L,
          keyCols = Seq("id"))))

      if (warmed)
        println(f"PROBE cdf_scale n=$n scoped_delete=$tDel%.2f s " +
          f"($nDelRows rows over $nDelFiles planned files) " +
          f"full_merge=$tUp%.2f s ($feedUp rows)")
      warmed = true
      made.foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
      made.clear()
    }
    spark.stop()
  }
}
