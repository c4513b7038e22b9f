package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Dev diagnostic: decompose the per-query fixed latency floor by
  * timing the SQL headline queries under runtime-settable conf
  * variants (AQE on/off × shuffle-partition counts) over cached
  * tables. Not part of the driver contract — used to pick the bench
  * session tuning with data instead of guesses.
  */
object LatencyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val qs = SparkEntry.queries
    val names = sys.env.get("PROBE_QUERIES")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("a1_count", "a2_groupby_count", "a5_topk_group",
        "a6_date_topk", "a9_numeric_summary", "f2_text_search",
        "f11_arithmetic", "j1_join_broadcast", "j2_join_3way",
        "w1_topk_per_group"))
    // split single-file tables into multiple scan partitions BEFORE
    // caching, so the cached relation is actually parallel
    spark.conf.set("spark.sql.files.maxPartitionBytes",
      sys.env.getOrElse("PROBE_MPB", "4194304"))
    if (sys.env.contains("PROBE_NOCOMPRESS"))
      spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).cache())
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    // codegen warm
    names.foreach(n => qs(n)(spark, sfDir).count())

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "67108864")
    if (sys.env.contains("PROBE_EXPLAIN")) {
      names.foreach { n =>
        val df = qs(n)(spark, sfDir)
        df.count()
        println(s"=== $n ===\n${df.queryExecution.executedPlan}")
      }
      spark.stop(); return
    }
    // variants: "sp=<n>" shuffle partitions, "smj=<t|f>" prefer SMJ —
    // comma-separated in PROBE_VARIANTS, e.g. "sp=1,sp=4,sp=8,smj=t"
    val variants = sys.env.getOrElse("PROBE_VARIANTS", "smj=t,smj=f")
      .split(",").toSeq
    for (label <- variants) {
      label.split("=") match {
        case Array("sp", n)  => spark.conf.set("spark.sql.shuffle.partitions", n)
        case Array("smj", v) => spark.conf.set(
          "spark.sql.join.preferSortMergeJoin", (v == "t").toString)
        case _ => ()
      }
      // one untimed pass so each variant's plans are compiled
      names.foreach(n => qs(n)(spark, sfDir).count())
      val times = names.map { n =>
        val t0 = System.nanoTime()
        qs(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label  total=${times.sum}%.3f  " +
        names.zip(times).map { case (n, t) => f"$n=$t%.3f" }.mkString(" "))
    }
    spark.stop()
  }
}
