package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.{GraftSession, Tables}

/** Records the j2_join_3way hint decision (round-14 ask): the pinned
  * SHUFFLE_HASH fact⋈fact plan vs what AQE picks unhinted, timed at
  * sf0.1 and at a replicated x10 tier. Run:
  * `sbt "runMain graft.tools.J2HintProbe [sfDir [mult]]"`; the
  * recorded run lives in SCALE_PROBES.md and the winner is pinned in
  * PlanSpec.
  */
object J2HintProbe {

  private def timed(b: => Unit): Double = {
    val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)

    def tier(li: DataFrame, ord: DataFrame, label: String): Unit = {
      def q(hint: Option[String]): DataFrame = {
        val o = hint.map(ord.hint(_)).getOrElse(ord)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(spark, sfDir)),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_items"))
          .orderBy("c_mktsegment")
      }
      for (h <- Seq(Some("shuffle_hash"), Some("merge"), None)) {
        val name = h.getOrElse("aqe_unhinted")
        q(h).count() // warm
        val t = (1 to 5).map(_ => timed(q(h).count())).min
        val plan = q(h).queryExecution.executedPlan.toString
        val shape =
          if (plan.contains("ShuffledHashJoin")) "ShuffledHashJoin"
          else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
          else if (plan.contains("BroadcastHashJoin") &&
            !plan.contains("ShuffledHash")) "BroadcastHashJoin(fact!)"
          else "?"
        println(f"PROBE j2 tier=$label hint=$name min_sec=$t%.3f plan=$shape")
      }
    }

    val li0 = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
    val ord0 = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey")
    tier(li0, ord0, s"sf=$sfDir")

    // replicated tier: both facts multiplied, keys shifted per replica
    // so join multiplicity is preserved (the Bench x10 construction)
    val rep = broadcast(spark.range(mult).select(col("id").as("rep")))
    val liX = li0.crossJoin(rep)
      .select((col("l_orderkey") + col("rep") * 100000000L)
        .as("l_orderkey"), col("l_quantity"))
      .repartition(32).localCheckpoint(true)
    val ordX = ord0.crossJoin(rep)
      .select((col("o_orderkey") + col("rep") * 100000000L)
        .as("o_orderkey"), col("o_custkey"))
      .repartition(32).localCheckpoint(true)
    tier(liX, ordX, s"x$mult")
    spark.stop()
  }
}
