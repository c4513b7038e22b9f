package graft.tools

import graft.GraftSession

/** Round-14 follow-up to [[IngestFloorProbe]]: the packing sweep
  * showed the 240-docket pass takes ~10 s across 32 tasks while ONE
  * coalesced task does all 7200 files in ~1.9 s — the floor is
  * CONTENTION in the parallel path, not scheduling (partition count
  * barely moves it) and not Jackson (0.26 ms/file single-core).
  * This probe isolates where: task-count sweep, flatten on/off,
  * input_file_name on/off.
  */
object IngestContentionProbe {
  private def timed(b: => Unit): Double = {
    val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val root = java.nio.file.Files
      .createTempDirectory("graft_ingest_cont").toString
    try {
      graft.sources.FixtureTree.writeComments(
        root, nDockets = 240, commentsPerDocket = 30)
      val found = graft.sources.JsonApi.discover(spark, root)
      val dirs = found.map(_.dir)
      def raw() = graft.sources.JsonApi.readRaw(spark, dirs)
      // warm
      graft.sources.Flatten.comments(raw()).count()

      // planning/listing alone: build the file index, zero tasks
      val tPlan = (1 to 3).map(_ =>
        timed(raw().queryExecution.executedPlan)).min
      println(f"PROBE plan_only sec=$tPlan%.3f")

      for (n <- Seq(1, 2, 4, 8, 16, 32)) {
        val t = (1 to 3).map(_ =>
          timed(graft.sources.Flatten.comments(raw().coalesce(n)).count())).min
        println(f"PROBE flatten_coalesce n_tasks=$n sec=$t%.3f")
      }
      // raw scan only (no flatten), default partitioning
      val tRaw = (1 to 3).map(_ => timed(raw().count())).min
      println(f"PROBE raw_count_default sec=$tRaw%.3f")
      // flatten, default partitioning (the production shape)
      val tFlat = (1 to 3).map(_ =>
        timed(graft.sources.Flatten.comments(raw()).count())).min
      println(f"PROBE flatten_default sec=$tFlat%.3f")
    } finally graft.sources.FixtureTree
      .deleteRecursively(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
