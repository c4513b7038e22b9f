package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftSession, Tables}

/** Scratch A/B: presentational final sort on a provably-small result —
  * global `orderBy` (rangepartitioning exchange + boundary-sampling job)
  * vs single-partition shuffle + local sort (no sampling job, one fewer
  * stage). Interleaved runs, medians; run via
  * `sbt "runMain graft.tools.ProbeFinalSort"`. Not part of the gate. */
object ProbeFinalSort {
  def t(label: String)(body: => Unit): Double = {
    body
    val runs = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    println(f"FSORT $label min=${runs.min}%.3f med=${runs.sorted.apply(2)}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    runs.sorted.apply(2)
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "67108864")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4194304")
    Tables.names.foreach(n => Tables.load(spark, d, n).cache())
    Tables.names.foreach(n => Tables.load(spark, d, n).count())
    val li = Tables.lineitem(spark, d); val or = Tables.orders(spark, d)
    val cu = Tables.customer(spark, d)

    def j2base() =
      li.join(or.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_items"))
    def w1base() = {
      val joined = or.join(broadcast(cu), col("o_custkey") === col("c_custkey"))
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      joined.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
    }
    // interleaved: orderBy vs repartition(1)+sortWithinPartitions, 3 rounds
    for (round <- 1 to 3) {
      t(s"j2_orderby_$round")(j2base().orderBy("c_mktsegment").count())
      t(s"j2_rep1sort_$round")(j2base().repartition(1)
        .sortWithinPartitions("c_mktsegment").count())
      t(s"w1_orderby_$round")(w1base()
        .orderBy(col("c_mktsegment"), col("o_totalprice").desc, col("o_orderkey")).count())
      t(s"w1_rep1sort_$round")(w1base().repartition(1)
        .sortWithinPartitions(col("c_mktsegment"), col("o_totalprice").desc, col("o_orderkey")).count())
    }
    spark.stop()
  }
}
