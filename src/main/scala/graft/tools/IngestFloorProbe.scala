package graft.tools

import graft.GraftSession

/** Decomposes one ingest-throughput pass (the Bench
  * `dockets_per_sec` measurement) into its cost components so the
  * ~19–20 dockets/sec local plateau is a MEASURED floor, not a guess:
  * driver-side discovery listing, the JSON read+flatten+count job,
  * and the same job again at a doubled tree (does the rate scale
  * with dockets, i.e. is the plateau fixed-overhead-bound?).
  *
  * Run: `sbt "runMain graft.tools.IngestFloorProbe"`; the recorded
  * run lives in SCALE_PROBES.md.
  */
object IngestFloorProbe {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    for (nDockets <- Seq(60, 120, 240)) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_ingest_floor_$nDockets").toString
      try {
        graft.sources.FixtureTree.writeComments(
          root, nDockets = nDockets, commentsPerDocket = 30)
        // warm codegen/readers once so the split reflects steady state
        val warmFound = graft.sources.JsonApi.discover(spark, root)
        graft.sources.Flatten.comments(
          graft.sources.JsonApi.readRaw(spark, warmFound.map(_.dir))).count()

        val (found, tDisc) = timed(graft.sources.JsonApi.discover(spark, root))
        val (_, tRead) = timed(
          graft.sources.Flatten.comments(
            graft.sources.JsonApi.readRaw(spark, found.map(_.dir))).count())
        val total = tDisc + tRead
        println(f"PROBE ingest n_dockets=$nDockets discover_sec=$tDisc%.3f " +
          f"read_flatten_count_sec=$tRead%.3f " +
          f"dockets_per_sec=${nDockets / total}%.1f " +
          f"files=${found.size}")
      } finally graft.sources.FixtureTree
        .deleteRecursively(java.nio.file.Paths.get(root))
    }
    spark.stop()
  }
}
