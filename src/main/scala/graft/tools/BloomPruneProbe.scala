package graft.tools

import org.apache.spark.sql.functions._

import graft.{Bench, GraftSession}
import graft.maintain.Snapshots

/** Measure what per-file bloom stats buy on an UNCLUSTERED layout at
  * the x100 tier — the claim behind `snap_key_lookup` and
  * `commitDeleteKeys`, measured instead of asserted.
  *
  * Setup: the x100 orders (≈15M rows at sf0.1×100) hash-shuffled into
  * 64 files and committed ONCE with min/max + bloom stats on
  * `o_orderkey` (the fixture caches across runs: table path keyed on
  * the fixture dir). Every file spans the whole key space, so range
  * stats are structurally useless here; the probe times a 3-key
  * lookup through (a) the plain full scan + IN, (b) the
  * range-stat-only pruned read (expected: no pruning), (c) the
  * bloom-pruned read — and reports files planned for each, plus the
  * one-time cost of recording the blooms at commit. Solo run
  * (bench methodology: no concurrent Spark JVMs).
  */
object BloomPruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val dir = Bench.ensureScaledFixture(spark, sfDir, 100)
    // v2: auto-sized blooms (the fixed 131 Kbit default saturated at
    // 234k keys/file and pruned nothing — the measurement that drove
    // the auto-sizing)
    val path = "target/bloom_probe_v2_" +
      java.lang.Integer.toHexString(dir.hashCode)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    if (Snapshots.versions(spark, path) != Seq(1L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_totalprice").repartition(64)
      val tPlain = time { // baseline: the same write WITHOUT stats
        orders.write.mode("overwrite").parquet(s"$path-plain")
      }
      val tCommit = time {
        Snapshots.create(orders, path,
          statsCols = Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
      }
      println(f"PROBE bloom_prune commit: plain_write=$tPlain%.2f s " +
        f"stats+bloom_commit=$tCommit%.2f s " +
        f"(overhead=${(tCommit / tPlain - 1) * 100}%.0f%%)")
    }
    val keys = Seq(1000L, 2000L, 3000L)
    val total = Snapshots.read(spark, path).inputFiles.length
    def full(): Long = Snapshots.read(spark, path)
      .filter(col("o_orderkey").isin(keys: _*)).count()
    def ranged(): Long = Snapshots.readVersionWhere(spark, path, 1,
        "o_orderkey", 1000.0, 3000.0)
      .filter(col("o_orderkey").isin(keys: _*)).count()
    def bloomed(): Long = Snapshots.readVersionWhereKeys(spark, path, 1,
        "o_orderkey", keys.map(BigDecimal(_)))
      .filter(col("o_orderkey").isin(keys: _*)).count()
    full(); bloomed() // warm JIT + FS caches
    val nBloom = Snapshots.readVersionWhereKeys(spark, path, 1,
      "o_orderkey", keys.map(BigDecimal(_))).inputFiles.length
    (1 to 3).foreach { i =>
      val tf = time(full()); val tr = time(ranged()); val tb = time(bloomed())
      println(f"PROBE bloom_prune rep=$i full=$tf%.3f s " +
        f"ranged=$tr%.3f s bloomed=$tb%.3f s " +
        f"files: full=$total ranged=$total bloomed=$nBloom " +
        f"speedup=${tf / tb}%.1fx")
    }
    spark.stop()
  }
}
