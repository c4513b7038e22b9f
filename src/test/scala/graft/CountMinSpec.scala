package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMinExprs.{cm_agg, cm_estimate}
import graft.operators.HeavyHitters

class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed fixture: key k occurs k times, keys 1..60 → 1830 rows
  private lazy val skewed = spark.range(1, 61)
    .select(explode(sequence(lit(1), $"id")).as("dup"), $"id".as("key"))
    .select("key")

  test("estimates never undercount (one-sided error)") {
    val sketch = skewed
      .agg(cm_agg(xxhash64($"key"), 4, 1024).as("cm"))
      .head().getAs[Array[Byte]]("cm")
    val bad = skewed.groupBy("key").count()
      .withColumn("est",
        cm_estimate(lit(sketch), xxhash64($"key"), 4, 1024))
      .filter($"est" < $"count")
      .count()
    assert(bad == 0, s"$bad keys undercounted — CM one-sidedness broken")
  }

  test("estimate error within the N/width bound (with slack)") {
    val n = skewed.count()
    val width = 1024
    val sketch = skewed
      .agg(cm_agg(xxhash64($"key"), 4, width).as("cm"))
      .head().getAs[Array[Byte]]("cm")
    val worst = skewed.groupBy("key").count()
      .withColumn("est",
        cm_estimate(lit(sketch), xxhash64($"key"), 4, width))
      .select(max($"est" - $"count")).head().getLong(0)
    assert(worst <= 3 * n / width + 1,
      s"max overestimate $worst above 3N/w bound (N=$n, w=$width)")
  }

  test("merge is partition-order independent (identical sketches)") {
    def build(parts: Int): Array[Byte] = skewed.repartition(parts)
      .agg(cm_agg(xxhash64($"key"), 4, 256).as("cm"))
      .head().getAs[Array[Byte]]("cm")
    assert(java.util.Arrays.equals(build(1), build(13)),
      "sketch differs with partitioning — merge not associative")
  }

  test("codegen and interpreted cm_estimate agree") {
    val sketch = skewed
      .agg(cm_agg(xxhash64($"key"), 4, 512).as("cm"))
      .head().getAs[Array[Byte]]("cm")
    val probes = spark.range(0, 200).toDF("key")
    def results(mode: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try probes
        .select(cm_estimate(lit(sketch), xxhash64($"key"), 4, 512))
        .as[Long].collect().toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(results("CODEGEN_ONLY") == results("NO_CODEGEN"))
  }

  test("heavy hitters ≡ full GROUP BY HAVING (exact, superset-pruned)") {
    val exact = skewed.groupBy("key").count()
      .filter($"count" >= 30)
      .as[(Long, Long)].collect().toSet
    val hh = HeavyHitters
      .heavyHitters(skewed, "key", minCount = 30L, width = 1024)
      .as[(Long, Long)].collect().toSet
    assert(hh == exact)
    assert(exact.nonEmpty)
    assert(exact.size == 31) // keys 30..60
  }

  test("heavy hitters on the events fixture matches plain aggregation") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val exact = ev.groupBy("user_id").count().filter($"count" >= 50)
      .withColumnRenamed("count", "n_rows")
      .as[(Long, Long)].collect().toSet
    val hh = HeavyHitters.heavyHitters(ev, "user_id", minCount = 50L)
      .as[(Long, Long)].collect().toSet
    assert(hh == exact)
    assert(exact.nonEmpty)
  }
}
