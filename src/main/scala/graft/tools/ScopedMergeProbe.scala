package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.maintain.Snapshots

/** Measures the claim on [[Snapshots.commitUpsertScoped]]: a merge
  * touching ONE partition's keys must cost the touched partition, not
  * the table — i.e. scoped-merge latency stays FLAT as the table
  * grows, while the full-rewrite `commitUpsert` grows linearly.
  *
  * Method (solo, no concurrent Spark JVMs): for table sizes N ∈
  * {1M, 4M, 16M} rows across 32 scope partitions (range-clustered,
  * scope stats recorded), time (a) `commitUpsertScoped` updating 1k
  * keys of one scope and (b) `commitUpsert` with the same updates.
  * Also records the manifest file-diff (files rewritten / carried) so
  * the latency claim is tied to the mechanism, not inferred.
  */
object ScopedMergeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    var warmed = false
    val made = scala.collection.mutable.Buffer.empty[String]
    for (n <- Seq(100000L, 1000000L, 4000000L, 16000000L)) {
      def fresh(tag: String): String = {
        // repo-root-relative like the sibling probes, but absolute-ized
        // and pre-created so cwd and a clean checkout can't break it
        val parent = java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get("target").toAbsolutePath)
        val base = java.nio.file.Files.createTempDirectory(
          parent, s"scoped-probe-$tag")
        made += base.toString
        val dir = base.toString + "/t"
        val df = spark.range(n).select(
            $"id", ($"id" % 32).as("scope"),
            ($"id" * 7 % 1000).cast("double").as("v"),
            lit(1L).as("ver"), lit(0L).as("tb"))
          .repartitionByRange(32, $"scope")
        Snapshots.create(df, dir, statsCols = Seq("scope"))
        dir
      }
      val updates = spark.range(1000).select(
        ($"id" * 32 + 5).as("id"), lit(5L).as("scope"),
        lit(-1.0).as("v"), lit(2L).as("ver"), lit(0L).as("tb"))

      val scopedTbl = fresh("scoped")
      val v1Files = Snapshots.read(spark, scopedTbl).inputFiles.toSet
      val (_, tScoped) = timed(Snapshots.commitUpsertScoped(
        updates, scopedTbl, Seq("id"), "ver", "tb", "scope"))
      val v2Files = Snapshots.readVersion(spark, scopedTbl, 2)
        .inputFiles.toSet
      val carried = (v1Files & v2Files).size

      val fullTbl = fresh("full")
      val (_, tFull) = timed(Snapshots.commitUpsert(
        updates, fullTbl, Seq("id"), "ver", "tb"))

      // the first size is a JIT/classload warmup round: both paths
      // run, nothing is reported
      if (warmed)
        println(f"PROBE scoped_merge n=$n scoped=$tScoped%.2f s " +
          f"(carried $carried/${v1Files.size} files) full=$tFull%.2f s " +
          f"speedup=${tFull / tScoped}%.1fx")
      warmed = true
      // multi-GB probe tables: sweep each size's dirs before the next
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
