package graft.tools

import graft.{Bench, GraftSession, SparkEntry}

/** r16 verdict ask #8: pin the j2b x100 variance band ONCE, so the
  * 1.8×–4.1× spark-vs-DuckDB spread seen across rounds (the DuckDB
  * side alone swings 0.78–1.80 s with ambient load on this shared
  * box) is a documented measurement property instead of a number
  * re-litigated every round.
  *
  * Method: solo run (no concurrent Spark JVMs — the repo's bench
  * methodology), x100 fixture, production posture (AQE on, 32
  * shuffle partitions — the same tuning the bench's x100 tier uses),
  * one cold pass to build/validate the bucketed layout and warm JIT,
  * then N alternating SAME-RUN (spark, duckdb) pairs so each ratio
  * is load-matched the way the driver's bench is. Output lands in
  * SCALE_PROBES.md and the band is annotated in BASELINE.md.
  */
object J2bVarianceProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val dir = Bench.ensureScaledFixture(spark, sfDir, 100)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    val q = SparkEntry.queries("j2b_bucketed_3way")
    def once(): Double = {
      val t0 = System.nanoTime()
      q(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = once() // builds/meta-validates the bucketed layout + JIT
    println(f"PROBE j2b_var cold=$cold%.3f s (layout build + JIT)")
    val pairs = (1 to reps).map { i =>
      val s = once()
      val (d, _) = Bench.duckdbHeadline(dir, 1800,
        Seq("j2b_bucketed_3way"))
      println(f"PROBE j2b_var rep=$i spark=$s%.3f duckdb=$d%.3f " +
        f"ratio=${s / d}%.2f")
      (s, d)
    }
    val ss = pairs.map(_._1)
    val dd = pairs.map(_._2).filter(_ > 0) // -1.0 = duckdb unavailable
    def band(tag: String, v: Seq[Double]): Unit =
      if (v.isEmpty) println(s"PROBE j2b_var ${tag}_band=n/a (no samples)")
      else println(f"PROBE j2b_var ${tag}_band=[${v.min}%.3f, " +
        f"${v.max}%.3f] median=${v.sorted.apply(v.size / 2)}%.3f")
    band("spark", ss)
    band("duckdb", dd)
    band("ratio", pairs.filter(_._2 > 0).map(p => p._1 / p._2))
    spark.stop()
  }
}
