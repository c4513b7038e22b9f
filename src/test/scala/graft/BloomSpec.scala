package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomExprs
import graft.functions.BloomExprs.{bloom_agg, bloom_might_contain}
import graft.operators.BloomJoin

class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val lineitem = Tables.lineitem(spark, TestSpark.sf0001)
  private lazy val urgent = Tables.orders(spark, TestSpark.sf0001)
    .filter($"o_orderpriority" === "1-URGENT")
    .select("o_orderkey")

  test("no false negatives: filter admits every inserted key") {
    val keys = spark.range(0, 5000).select(xxhash64($"id").as("h"))
    val bloom = keys.agg(bloom_agg($"h", 1 << 16, 5).as("bf"))
    val missed = keys.crossJoin(broadcast(bloom))
      .filter(!bloom_might_contain($"bf", $"h", 5))
      .count()
    assert(missed == 0, s"$missed inserted keys reported absent")
  }

  test("false-positive rate near the sized target") {
    // insert 0..9999, probe a disjoint range; m,k sized for fpp=0.01
    val m = BloomExprs.optimalNumBits(10000L, 0.01)
    val k = BloomExprs.optimalK(m, 10000L)
    val bloom = spark.range(0, 10000)
      .agg(bloom_agg(xxhash64($"id"), m, k).as("bf"))
    val fp = spark.range(1000000, 1100000)
      .crossJoin(broadcast(bloom))
      .filter(bloom_might_contain($"bf", xxhash64($"id"), k))
      .count()
    val rate = fp / 100000.0
    assert(rate < 0.03, f"fp rate $rate%.4f far above the 0.01 target")
    assert(rate > 0.0005, f"fp rate $rate%.5f implausibly low — probe broken?")
  }

  test("merge is partition-order independent (bit-identical sketches)") {
    val ks = spark.range(0, 2000)
    def build(parts: Int): Array[Byte] = ks.repartition(parts)
      .agg(bloom_agg(xxhash64($"id"), 1 << 14, 5).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    assert(java.util.Arrays.equals(build(1), build(13)),
      "sketch differs with partitioning — merge not associative/commutative")
  }

  test("codegen and interpreted might_contain agree") {
    val bloom = spark.range(0, 1000)
      .agg(bloom_agg(xxhash64($"id"), 1 << 13, 5).as("bf"))
    val probes = spark.range(0, 4000).crossJoin(broadcast(bloom))
    def results(codegen: String): Seq[Boolean] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try probes.select(bloom_might_contain($"bf", xxhash64($"id"), 5))
        .as[Boolean].collect().toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(results("CODEGEN_ONLY") == results("NO_CODEGEN"))
  }

  test("bloom semi join ≡ plain left semi join") {
    val plain = lineitem
      .join(urgent.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    val bloomed = BloomJoin
      .semiJoin(lineitem, urgent, "l_orderkey", "o_orderkey",
        expectedItems = 2000L, fpp = 0.01)
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    assert(bloomed == plain)
    assert(plain.nonEmpty)
  }

  test("bloom anti join ≡ plain left anti join") {
    val plain = lineitem
      .join(urgent.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_anti")
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    val bloomed = BloomJoin
      .antiJoin(lineitem, urgent, "l_orderkey", "o_orderkey",
        expectedItems = 2000L, fpp = 0.01)
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    assert(bloomed == plain)
    assert(plain.nonEmpty)
  }

  test("prune actually reduces the probe and survivors cover matches") {
    val m = BloomExprs.optimalNumBits(2000L, 0.01)
    val k = BloomExprs.optimalK(m, 2000L)
    val bloom = BloomJoin.buildFilter(urgent, "o_orderkey", m, k)
    val survivors = BloomJoin.prune(lineitem, "l_orderkey", bloom, k)
    val nProbe = lineitem.count()
    val nSurvive = survivors.count()
    val nMatch = lineitem
      .join(urgent.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi").count()
    assert(nSurvive >= nMatch, "bloom dropped a true match (false negative!)")
    assert(nSurvive < nProbe,
      s"no pruning happened ($nSurvive of $nProbe survived)")
  }

  test("bloom inner join ≡ plain inner join on the key") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .filter($"o_totalprice" > 400000)
    val plain = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    val bloomed = BloomJoin
      .innerJoin(lineitem, orders, "l_orderkey", "o_orderkey",
        expectedItems = 2000L)
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    assert(bloomed == plain)
    assert(plain.nonEmpty)
  }

  test("bloom contamination ≡ broadcast contamination") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val probe = docs.filter(pmod($"doc_id", lit(50)) =!= 0)
    val bench = docs.filter(pmod($"doc_id", lit(50)) === 0)
    val plain = graft.llm.Dedup.contaminationHits(probe, bench, k = 4)
      .as[(Long, Long)].collect().toSet
    val bloomed = graft.llm.Dedup
      .contaminationHitsBloom(probe, bench, k = 4,
        expectedShingles = 50000L)
      .as[(Long, Long)].collect().toSet
    assert(bloomed == plain)
    assert(plain.nonEmpty)
  }

  test("might_contain is SQL-callable (extensions/registry path)") {
    graft.functions.GraftFunctions.register(spark)
    spark.range(0, 100)
      .agg(bloom_agg(xxhash64($"id"), 4096, 5).as("bf"))
      .createOrReplaceTempView("bloom_t")
    val n = spark.sql(
      """SELECT COUNT(*) AS n FROM range(0, 100) r, bloom_t
         WHERE bloom_might_contain(bf, xxhash64(r.id), 5)""")
      .head().getAs[Long]("n")
    assert(n == 100)
  }
}
