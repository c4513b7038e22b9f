package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Decomposition of j2b_bucketed_3way's residual x100 gap (r15
  * verdict ask #1: 3.58 s vs DuckDB 1.04 s with the Exchange already
  * eliminated — where does the time go?).
  *
  * Axes measured, all at the x100 tier over the SAME bucketed layout
  * machinery j2b ships ([[graft.queries.JoinQueries.bucketedFacts]]):
  *
  *   - scan floor: count-style scan of each bucketed fact table alone
  *     (the IO + decode cost no join plan can beat);
  *   - join floor: the bucketed SMJ + global count, no dim join, no
  *     group-by (isolates merge cost from aggregation);
  *   - full j2b at bucket counts 32 / 64 / 128 (is the no-shuffle
  *     join parallelism-pinned at 32 buckets on 32 cores?);
  *   - SHUFFLE_HASH vs MERGE on the bucketed layout (bucketing
  *     satisfies SHJ's distribution requirement too — does skipping
  *     the streamed merge beat the saved hash build?);
  *   - pre-aggregated join: lineitem pre-counted per l_orderkey
  *     (bucketed by the grouping key → partial+final agg with NO
  *     exchange), shrinking the join's probe side 4× before the SMJ;
  *   - vectorized reader batch size 4096 (default) vs 16384.
  *
  * Run: `sbt "runMain graft.tools.J2bDecompProbe [sfDir [mult]]"`.
  * Findings recorded in SCALE_PROBES.md (r16).
  */
object J2bDecompProbe {

  private def timed(b: => Unit): Double = {
    val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9
  }

  private def best(n: Int)(b: => Unit): Double =
    (1 to n).map(_ => timed(b)).min

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(100)
    val dir = graft.Bench.ensureScaledFixture(spark, sfDir, mult)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    def agg(li: DataFrame, ord: DataFrame): Long =
      li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, dir)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_items"))
        .count()

    for (buckets <- Seq(32, 64, 128)) {
      val (li, ord) = graft.queries.JoinQueries.bucketedFacts(
        spark, dir, buckets)
      agg(li, ord) // warm (also pays the one-time layout on first use)
      val t = best(3)(agg(li, ord))
      println(f"PROBE j2b_decomp buckets=$buckets full_j2b min_sec=$t%.2f")

      if (buckets == 32) {
        // scan floor: pure IO+decode per side
        val tLi = best(3)(li.select("l_orderkey")
          .agg(count(lit(1))).count())
        val tOrd = best(3)(ord.select("o_orderkey", "o_custkey")
          .agg(count(lit(1))).count())
        println(f"PROBE j2b_decomp scan_floor lineitem=$tLi%.2f " +
          f"orders=$tOrd%.2f")

        // join floor: SMJ + global count, no dim join / group-by
        val tJoin = best(3)(
          li.join(ord.hint("merge"),
              col("l_orderkey") === col("o_orderkey"))
            .agg(count(lit(1))).count())
        println(f"PROBE j2b_decomp join_floor smj_count=$tJoin%.2f")

        // SHJ on the same bucketed layout
        val tShj = best(3)(
          li.join(ord.hint("shuffle_hash"),
              col("l_orderkey") === col("o_orderkey"))
            .join(broadcast(Tables.customer(spark, dir)),
              col("o_custkey") === col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(count(lit(1)).as("n_items")).count())
        val shjPlan = li.join(ord.hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"))
          .queryExecution.executedPlan.toString
        val shjNoEx = !shjPlan.contains("Exchange hashpartitioning")
        println(f"PROBE j2b_decomp shj_full min_sec=$tShj%.2f " +
          f"no_exchange=$shjNoEx")

        // pre-agg: count lineitem rows per orderkey first (bucketed by
        // the grouping key → exchange-free agg), then a 15M⋈15M SMJ
        def preAgg(): Long = {
          val liCnt = li.groupBy("l_orderkey")
            .agg(count(lit(1)).as("li_n"))
          liCnt.join(ord.hint("merge"),
              col("l_orderkey") === col("o_orderkey"))
            .join(broadcast(Tables.customer(spark, dir)),
              col("o_custkey") === col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(sum("li_n").as("n_items")).count()
        }
        preAgg() // warm
        val tPre = best(3)(preAgg())
        println(f"PROBE j2b_decomp preagg_join min_sec=$tPre%.2f")

        // reader batch size
        spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "16384")
        val tBig = best(3)(agg(li, ord))
        spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4096")
        println(f"PROBE j2b_decomp batch16384 full_j2b min_sec=$tBig%.2f")

        // post-join decomposition: where do full − join_floor go?
        // (a) SMJ + broadcast dim + global count (no group-by)
        val tDim = best(3)(
          li.join(ord.hint("merge"),
              col("l_orderkey") === col("o_orderkey"))
            .join(broadcast(Tables.customer(spark, dir)),
              col("o_custkey") === col("c_custkey"))
            .agg(count(lit(1))).count())
        println(f"PROBE j2b_decomp dim_join_count min_sec=$tDim%.2f")
        // (b) SMJ + group by long custkey (no dim join, no strings)
        val tCust = best(3)(
          li.join(ord.hint("merge"),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(count(lit(1))).count())
        println(f"PROBE j2b_decomp custkey_groupby min_sec=$tCust%.2f")

        // stacked: pre-agg lineitem AND aggregate by custkey BEFORE
        // the broadcast dim join — the dim join and the string
        // group-by then see 1.5M rows, not 60M
        def stacked(liX: DataFrame, ordX: DataFrame): Long = {
          val liCnt = liX.groupBy("l_orderkey")
            .agg(count(lit(1)).as("li_n"))
          liCnt.join(ordX.hint("merge"),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(sum("li_n").as("cust_n"))
            .join(broadcast(Tables.customer(spark, dir)),
              col("o_custkey") === col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(sum("cust_n").as("n_items")).count()
        }
        stacked(li, ord) // warm
        val tStk = best(3)(stacked(li, ord))
        val stkPlan = {
          val liCnt = li.groupBy("l_orderkey")
            .agg(count(lit(1)).as("li_n"))
          liCnt.join(ord.hint("merge"),
              col("l_orderkey") === col("o_orderkey"))
            .queryExecution.executedPlan.toString
        }
        val stkNoEx = !stkPlan.contains("Exchange hashpartitioning")
        println(f"PROBE j2b_decomp stacked_preagg min_sec=$tStk%.2f " +
          f"fact_join_no_exchange=$stkNoEx")
      }
      if (buckets == 64) {
        // champion composition at 64 buckets
        def stacked64(): Long = {
          val liCnt = li.groupBy("l_orderkey")
            .agg(count(lit(1)).as("li_n"))
          liCnt.join(ord.hint("merge"),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(sum("li_n").as("cust_n"))
            .join(broadcast(Tables.customer(spark, dir)),
              col("o_custkey") === col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(sum("cust_n").as("n_items")).count()
        }
        stacked64() // warm
        val t64 = best(3)(stacked64())
        println(f"PROBE j2b_decomp stacked_preagg_b64 min_sec=$t64%.2f")
      }
    }
    spark.stop()
  }
}
