package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: one hot key (the 0→25k+ comments-per-docket
  * skew of the real corpus) must be split at runtime instead of
  * pinning one reducer. Thresholds are lowered to make the tiny test
  * dataset "skewed" by AQE's definition. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits a skewed join partition") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // hot key 0: 50k rows; 50 cold keys: 100 rows each
      val fact = spark.range(55000)
        .select(when($"id" < 50000, 0L).otherwise($"id" % 50 + 1).as("k"),
          concat(lit("payload-payload-payload-"), $"id").as("v"))
      val dim = spark.range(51).select($"id".as("k"), ($"id" * 10).as("w"))
      val joined = fact.join(dim, Seq("k"))
      // execute THIS plan (count() would plan its own aggregate and
      // leave joined's AQE un-finalized)
      assert(joined.collect().length == 55000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew="), s"no skew handling in final plan:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
