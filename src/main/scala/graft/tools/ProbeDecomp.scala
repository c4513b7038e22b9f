package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftSession, Tables}
/** Scratch decomposition probe for the two slowest comparable headline
  * queries (j2, w1): times the fact⋈fact join under broadcast vs shuffle
  * and prints the executed plans, so plan-shape changes are measured
  * rather than guessed. Not part of the gate; run via
  * `sbt "runMain graft.tools.ProbeDecomp"`. */
object ProbeDecomp {
  def t(label: String)(body: => Unit): Unit = {
    body
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    println(f"DECOMP $label min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
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
    def j2body(): Unit =
      li.join(or, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment").count()
    t("j2_bhj_orders")(j2body())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1048576")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    t("j2_shj_orders")(j2body())
    println("J2 SHJ PLAN:")
    println(li.join(or, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_items"))
      .orderBy("c_mktsegment").queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "67108864")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    val joined = or.join(broadcast(cu), col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy("c_mktsegment").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val w1df = joined.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
      .orderBy(col("c_mktsegment"), col("o_totalprice").desc, col("o_orderkey"))
    println("W1 PLAN:")
    println(w1df.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    println("windowGroupLimitThreshold=" +
      scala.util.Try(spark.conf.get(
        "spark.sql.optimizer.windowGroupLimitThreshold")).getOrElse("default"))
    // w1 timing with the WindowGroupLimit plan
    t("w1_window_topk")(w1df.count())
    spark.stop()
  }
}
