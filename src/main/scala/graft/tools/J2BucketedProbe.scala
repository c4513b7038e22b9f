package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** The at-scale answer to the j2 x100 ratio (round 14): the x100 spot
  * tier shows the lineitem⋈orders shuffle is j2's whole cost — Spark
  * pays a 60M+15M-row exchange per query where single-box DuckDB
  * joins in shared memory. A real deployment doesn't re-shuffle a
  * fact table per query: it lays the facts out BUCKETED on the join
  * key once ([[graft.maintain.Bucketing]]) and every subsequent join
  * on that key plans with NO Exchange on either side. This probe
  * measures that conversion at the x100 tier: the recurring shuffle
  * join vs the same aggregation over bucketed tables (one-time layout
  * cost reported alongside, amortized over every future join on the
  * key).
  *
  * Run: `sbt "runMain graft.tools.J2BucketedProbe [sfDir [mult]]"`;
  * the recorded run lives in SCALE_PROBES.md. BucketingSpec pins the
  * no-Exchange plan shape and row-for-row correctness at sf0.001.
  */
object J2BucketedProbe {

  private def timed(b: => Unit): Double = {
    val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(100)
    val dir = graft.Bench.ensureScaledFixture(spark, sfDir, mult)
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    def agg(li: org.apache.spark.sql.DataFrame,
        ord: org.apache.spark.sql.DataFrame): Long =
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, dir)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_items"))
        .count()

    // recurring shuffle join (the j2/x100 shape, uncached parquet —
    // both variants scan from disk so layout is the only difference)
    val li = Tables.lineitem(spark, dir).select("l_orderkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    agg(li, ord) // warm
    val tShuffle = (1 to 3).map(_ => timed(agg(li, ord))).min
    println(f"PROBE j2x${mult} shuffle_join min_sec=$tShuffle%.2f")

    // one-time bucketed layout on the join key
    val tLayout = timed {
      graft.maintain.Bucketing.writeBucketed(
        li, "probe_lineitem_b", "l_orderkey", 32)
      graft.maintain.Bucketing.writeBucketed(
        ord, "probe_orders_b", "o_orderkey", 32)
    }
    println(f"PROBE j2x${mult} bucket_layout_once sec=$tLayout%.2f")

    val liB = spark.table("probe_lineitem_b")
    val ordB = spark.table("probe_orders_b")
    agg(liB, ordB) // warm
    val tBucketed = (1 to 3).map(_ => timed(agg(liB, ordB))).min
    val plan = liB.join(ordB, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    val noExchange = !plan.contains("Exchange hashpartitioning")
    println(f"PROBE j2x${mult} bucketed_join min_sec=$tBucketed%.2f " +
      f"no_exchange=$noExchange speedup=${tShuffle / tBucketed}%.1fx")
    spark.sql("DROP TABLE IF EXISTS probe_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS probe_orders_b")
    spark.stop()
  }
}
