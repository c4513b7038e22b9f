package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Phase-2 of the j2b decomposition (r16): [[J2bDecompProbe]] showed
  * full j2b at x100 = scan 0.78 + SMJ ~0.5 + broadcast-dim probe
  * ~0.8 + group-by ~1.0, with bucket count 64 the best layout
  * (2.64 s vs 32's 3.08) and every custkey pre-aggregation route a
  * regression (1.5M-group partial aggs shuffle ~48M rows). The
  * remaining candidates this probe times, all at 64 buckets:
  *
  *   - dict-encoded dim join: project customer to
  *     (c_custkey, seg_id TINYINT) via a 5-row segment dictionary
  *     before broadcasting, group by seg_id, join names back at the
  *     end — the fact-side rows then carry a byte through the join
  *     and the aggregation instead of 60M string copies;
  *   - SHJ vs SMJ under the dict encoding;
  *   - lineitem pre-count per orderkey (exchange-free on the bucketed
  *     layout) composed with the dict join — the probe side drops to
  *     15M rows before the dim probe.
  *
  * Run: `sbt "runMain graft.tools.J2bChampionProbe [sfDir [mult]]"`.
  * Findings recorded in SCALE_PROBES.md (r16).
  */
object J2bChampionProbe {

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

    val (li, ord) = graft.queries.JoinQueries.bucketedFacts(spark, dir, 64)
    val cust = Tables.customer(spark, dir)

    // the 5-row segment dictionary and the dict-encoded customer
    import org.apache.spark.sql.expressions.Window
    val segDict = cust.select(col("c_mktsegment")).distinct()
      .withColumn("seg_id", row_number().over(
        Window.orderBy("c_mktsegment")).cast("tinyint"))
    val custDict = cust.join(broadcast(segDict), "c_mktsegment")
      .select(col("c_custkey"), col("seg_id"))

    def dictAgg(liX: DataFrame, hint: String): Long =
      liX.join(ord.hint(hint), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custDict), col("o_custkey") === col("c_custkey"))
        .groupBy("seg_id")
        .agg(count(lit(1)).as("n_items"))
        .join(broadcast(segDict), "seg_id")
        .select(col("c_mktsegment"), col("n_items"))
        .orderBy("c_mktsegment")
        .count()

    dictAgg(li, "merge") // warm
    val tDictSmj = best(3)(dictAgg(li, "merge"))
    println(f"PROBE j2b_champion b64_dict_smj min_sec=$tDictSmj%.2f")

    val tDictShj = best(3)(dictAgg(li, "shuffle_hash"))
    println(f"PROBE j2b_champion b64_dict_shj min_sec=$tDictShj%.2f")

    // pre-count lineitem per orderkey (bucket-local agg) + dict join
    def preDict(): Long = {
      val liCnt = li.groupBy("l_orderkey")
        .agg(count(lit(1)).as("li_n"))
      liCnt.join(ord.hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custDict), col("o_custkey") === col("c_custkey"))
        .groupBy("seg_id")
        .agg(sum("li_n").as("n_items"))
        .join(broadcast(segDict), "seg_id")
        .select(col("c_mktsegment"), col("n_items"))
        .orderBy("c_mktsegment")
        .count()
    }
    preDict() // warm
    val tPreDict = best(3)(preDict())
    println(f"PROBE j2b_champion b64_preagg_dict min_sec=$tPreDict%.2f")

    // control: the registered shape at b64, re-timed in this JVM
    def plain(): Long =
      li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment")
        .count()
    plain() // warm
    val tPlain = best(3)(plain())
    println(f"PROBE j2b_champion b64_plain min_sec=$tPlain%.2f")

    spark.stop()
  }
}
