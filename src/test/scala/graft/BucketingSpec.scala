package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.maintain.Bucketing

/** Bucketed co-located join: both sides pre-bucketed on the key →
  * the join plans with NO Exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed fact-fact join runs without a shuffle") {
    Bucketing.writeBucketed(
      Tables.orders(spark, TestSpark.sf0001), "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, TestSpark.sf0001), "lineitem_b", "l_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // force the shuffle-join path (broadcast would mask bucketing)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      // and it is correct
      assert(joined.count() ==
        Tables.lineitem(spark, TestSpark.sf0001)
          .join(Tables.orders(spark, TestSpark.sf0001),
            col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
