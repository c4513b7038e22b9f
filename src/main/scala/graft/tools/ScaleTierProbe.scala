package graft.tools

import graft.{Bench, GraftSession, Tables}

/** Dev diagnostic: exercise the bench's scale tier in isolation —
  * generate (or reuse) the 10× fixture, run the headline set on base
  * and scaled dirs with the bench's session tuning, and time the
  * DuckDB side on both. Not part of the driver contract; used to
  * validate the tier and record the Spark-vs-DuckDB crossover without
  * paying for the full 169-query suite per iteration.
  */
object ScaleTierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("PROBE_MULT", "10").toInt
    val spark = GraftSession.get()
    // same tuning as Bench.main
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "67108864")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4194304")
    def recache(dir: String): Unit = {
      Tables.names.foreach(n => Tables.load(spark, dir, n).cache())
      Tables.names.foreach(n => Tables.load(spark, dir, n).count())
    }
    def report(tag: String, rs: Seq[(String, Double, Double)]): Double = {
      rs.foreach { case (n, c, w) => println(f"[$tag] $n%-22s cold=$c%8.4f warm=$w%8.4f") }
      val t = rs.collect { case (_, _, w) if w >= 0 => w }.sum
      println(f"[$tag] spark_total=$t%.4f")
      t
    }

    val t0 = System.nanoTime()
    val scaled = Bench.ensureScaledFixture(spark, sfDir, mult)
    println(f"[gen] scaled dir $scaled in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    if (!sys.env.contains("PROBE_SKIP_BASE")) {
      recache(sfDir)
      val base = report("base", Bench.runHeadline(spark, sfDir))
      val (db, dq) = Bench.duckdbHeadline(sfDir, 300)
      println(f"[base] duckdb_total=$db%.4f ratio=${base / db}%.2f  $dq")
      spark.catalog.clearCache()
    }
    sys.env.get("PROBE_X10_SHUFFLE").foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n))
    if (sys.env.contains("PROBE_NOCOMPRESS"))
      spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    recache(scaled)
    sys.env.get("PROBE_EXPLAIN").foreach { qs =>
      qs.split(",").foreach { n =>
        val df = graft.SparkEntry.queries(n)(spark, scaled)
        df.count()
        println(s"=== $n ===\n${df.queryExecution.executedPlan}")
      }
    }
    val xs = report("x10", Bench.runHeadline(spark, scaled))
    spark.catalog.clearCache()
    val (xdb, xdq) = Bench.duckdbHeadline(scaled, 900)
    println(f"[x10] duckdb_total=$xdb%.4f ratio=${xs / xdb}%.2f  $xdq")
    spark.stop()
  }
}
