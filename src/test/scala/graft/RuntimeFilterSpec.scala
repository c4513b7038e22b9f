package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runtime (bloom-filter) join pruning — the Spark feature that, at
  * 100 TB, turns a selective dimension filter into a pushed probe-side
  * row filter before the shuffle: the fact side drops non-joining rows
  * at the scan instead of carrying them to the join. Off by default;
  * this spec pins that the engine's join shapes are eligible when a
  * deployment enables it. */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bloom-filter runtime filter injects into a selective fact join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the fixture tables are far below the default 10 GB threshold
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the non-broadcast path: runtime filters matter when the
      // join is a real shuffle (broadcast joins already prune via the
      // broadcast relation)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val d = TestSpark.sf0001
      val sel = Tables.orders(spark, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = Tables.lineitem(spark, d)
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") ||
        optimized.contains("BloomFilter") ||
        optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      assert(joined.collect().nonEmpty) // and the plan still runs
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
