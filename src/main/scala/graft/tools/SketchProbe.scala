package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.{DistinctSketches, HistogramSketch, QuantileSketches, ThetaSketches}

/** Scale evidence for the sketch-table family: measures, on the same
  * box and data, (a) the one-time per-bucket build cost, (b) the
  * range-query cost FROM THE TABLE, and (c) the raw-rescan cost the
  * table replaces — for all four members (HLL distinct, histogram
  * quantiles, KLL quantiles, theta overlap) — plus the table's size
  * in bytes. The claim being audited: after the build, range queries
  * read KB-scale sketch rows instead of rescanning raw events, so at
  * 100 TB the query cost is proportional to the buckets asked about,
  * not the corpus. Run:
  * `sbt "runMain graft.tools.SketchProbe [sfDir]"`; the recorded run
  * lives in SCALE_PROBES.md.
  */
object SketchProbe {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def dirBytes(p: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(p))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
      .localCheckpoint(true)
    val nRows = ev.count()
    val rawBytes = dirBytes(s"$sfDir/events.parquet")
    println(s"PROBE corpus sf=$sfDir n_events=$nRows raw_bytes=$rawBytes")

    val base = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "sketchprobe")
      .toString
    val rangeLo = "2024-01-02"; val rangeHi = "2024-01-09"
    def rawRange = ev.filter(col("day").between(rangeLo, rangeHi))

    // HLL — distinct users in range
    val (_, tBuildHll) = timed(DistinctSketches.writeSketchTable(
      ev, "day", "user_id", s"$base/hll"))
    val (_, tTableHll) = timed(
      spark.read.parquet(s"$base/hll")
        .filter(col("bucket").between(rangeLo, rangeHi))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))")).head())
    val (_, tRawHll) = timed(
      rawRange.agg(countDistinct(col("user_id"))).head())
    println(f"PROBE hll build=$tBuildHll%.2f table_query=$tTableHll%.2f " +
      f"raw_query=$tRawHll%.2f table_bytes=${dirBytes(s"$base/hll")}")

    // histogram — range quantiles (fixed domain)
    val (_, tBuildHist) = timed(HistogramSketch.writeHistogramTable(
      ev, "day", "value", 0.0, 500.0, 64, outPath = s"$base/hist"))
    val (_, tTableHist) = timed(HistogramSketch.rangeQuantiles(
      spark.read.parquet(s"$base/hist")
        .filter(col("bucket").between(rangeLo, rangeHi)),
      0.0, 500.0, 64, Seq(0.5)).head())
    val (_, tRawHist) = timed(
      rawRange.agg(percentile(col("value"), lit(0.5))).head())
    println(f"PROBE histogram build=$tBuildHist%.2f table_query=$tTableHist%.2f " +
      f"raw_query=$tRawHist%.2f table_bytes=${dirBytes(s"$base/hist")}")

    // KLL — range quantiles (no domain)
    val (_, tBuildKll) = timed(QuantileSketches.writeSketchTable(
      ev, "day", "value", s"$base/kll"))
    val (_, tTableKll) = timed(QuantileSketches.rangeQuantilesFromTable(
      spark, s"$base/kll",
      col("bucket").between(rangeLo, rangeHi), Seq(0.5)).head())
    println(f"PROBE kll build=$tBuildKll%.2f table_query=$tTableKll%.2f " +
      f"raw_query=$tRawHist%.2f table_bytes=${dirBytes(s"$base/kll")}")

    // theta — week-over-week overlap
    val (_, tBuildTheta) = timed(ThetaSketches.writeSketchTable(
      ev, "day", "user_id", s"$base/theta"))
    val (_, tTableTheta) = timed(ThetaSketches.overlapFromTable(
      spark, s"$base/theta",
      col("bucket").between("2024-01-01", "2024-01-07"),
      col("bucket").between("2024-01-08", "2024-01-14")).head())
    val (_, tRawTheta) = timed {
      val a = ev.filter(col("day").between("2024-01-01", "2024-01-07"))
        .select("user_id").distinct()
      val b = ev.filter(col("day").between("2024-01-08", "2024-01-14"))
        .select("user_id").distinct()
      a.join(b, Seq("user_id"), "left_semi").count()
    }
    println(f"PROBE theta build=$tBuildTheta%.2f table_query=$tTableTheta%.2f " +
      f"raw_query=$tRawTheta%.2f table_bytes=${dirBytes(s"$base/theta")}")
    spark.stop()
  }
}
