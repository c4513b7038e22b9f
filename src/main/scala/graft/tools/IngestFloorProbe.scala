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

    // ---- file-packing sweep (round-14 ask): is the per-file floor
    // scheduling (too many tiny-file partitions — fixable by packing
    // more files per task via openCostInBytes) or Jackson parse
    // (irreducible per-file CPU)? Sweep the open cost at the 240-
    // docket tier and also measure the parse alone via a single-
    // partition coalesced read.
    val root = java.nio.file.Files
      .createTempDirectory("graft_ingest_pack_240").toString
    try {
      graft.sources.FixtureTree.writeComments(
        root, nDockets = 240, commentsPerDocket = 30)
      val found = graft.sources.JsonApi.discover(spark, root)
      def pass(): Double = timed(
        graft.sources.Flatten.comments(
          graft.sources.JsonApi.readRaw(spark, found.map(_.dir))).count())._2
      pass() // warm
      for (openCost <- Seq(4194304L, 262144L, 65536L, 16384L, 4096L)) {
        spark.conf.set("spark.sql.files.openCostInBytes", openCost.toString)
        val t = (1 to 3).map(_ => pass()).min
        val parts = graft.sources.JsonApi.readRaw(spark, found.map(_.dir))
          .rdd.getNumPartitions
        println(f"PROBE pack open_cost=$openCost partitions=$parts " +
          f"sec=$t%.3f dockets_per_sec=${240 / t}%.1f")
      }
      spark.conf.unset("spark.sql.files.openCostInBytes")
      // Jackson-parse attribution: same files, one task — per-file CPU
      // with zero scheduling. files/sec here is the single-core parse
      // ceiling; cores × that is the box's parse-bound rate.
      val nFiles = graft.sources.JsonApi.readRaw(spark, found.map(_.dir))
        .select("src_file").distinct().count()
      val t1 = {
        val df = graft.sources.JsonApi.readRaw(spark, found.map(_.dir))
          .coalesce(1)
        timed(graft.sources.Flatten.comments(df).count())._2
      }
      println(f"PROBE parse_1core files=$nFiles sec=$t1%.3f " +
        f"files_per_core_sec=${nFiles / t1}%.1f " +
        f"ms_per_file=${t1 * 1000 / nFiles}%.3f")
    } finally graft.sources.FixtureTree
      .deleteRecursively(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
