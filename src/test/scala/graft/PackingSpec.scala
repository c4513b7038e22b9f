package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = (0L until 40L).map { i =>
    // deterministic token counts 1..13 across two sources
    (i, ("tok " * (1 + (i * 7 % 13)).toInt).trim,
      if (i % 2 == 0) "web" else "books")
  }.toDF("doc_id", "text", "source")

  test("packing conserves every token exactly once") {
    val perDoc = Packing.packOffsets(docs, buckets = 2, budgetTokens = 16L)
    val total = perDoc.agg(sum("n_tokens")).head().getLong(0)
    val viaShards = Packing.shardStats(docs, buckets = 2, budgetTokens = 16L)
      .agg(sum("shard_tokens")).head().getLong(0)
    assert(total == viaShards)
    assert(perDoc.count() == 40)
  }

  test("shard_seq is contiguous from 0 within every pack unit") {
    val stats = Packing.shardStats(docs, buckets = 2, budgetTokens = 16L)
    val bad = stats
      .groupBy("source", "bucket")
      .agg(min("shard_seq").as("lo"), max("shard_seq").as("hi"),
        countDistinct("shard_seq").as("n"))
      .filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1)
    assert(bad.isEmpty, s"gapped shard sequence:\n${bad.collect().mkString("\n")}")
  }

  test("a document's shard is the shard of its starting offset") {
    val perDoc = Packing.packOffsets(docs, buckets = 2, budgetTokens = 16L)
      .select("start_tok", "shard_seq").as[(Long, Long)].collect()
    perDoc.foreach { case (off, shard) => assert(shard == off / 16L) }
  }

  test("shard digests: reproducible across partitionings, change-sensitive") {
    val a = Packing.shardDigests(docs).collect().toSeq
    val b = Packing.shardDigests(docs.repartition(7)).collect().toSeq
    assert(a == b, "fingerprints must not depend on partitioning")
    // doc counts agree with the shard inventory
    val stats = Packing.shardStats(docs)
      .select("source", "bucket", "shard_seq", "n_docs").collect().toSeq
    val digs = Packing.shardDigests(docs)
      .select("source", "bucket", "shard_seq", "n_docs").collect().toSeq
    assert(digs == stats)
    // editing one document changes exactly the shards it belongs to
    val edited = docs.withColumn("text",
      when($"doc_id" === 0L, concat($"text", lit(" edited")))
        .otherwise($"text"))
    val c = Packing.shardDigests(edited).collect().toSeq
    assert(a != c)
  }

  test("padding waste: hand-computed power-of-two buckets") {
    // token counts 1, 2, 3, 5, 8 → buckets 1, 2, 4, 8, 8
    val tiny = Seq("a", "a b", "a b c", "a b c d e", "a b c d e f g h")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Packing.paddingWaste(tiny)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 1L, 0.0),
      (2L, 1L, 2L, 2L, 0.0),
      (4L, 1L, 3L, 4L, 0.25),
      (8L, 2L, 13L, 16L, 0.1875)))
  }

  test("assignment is deterministic under repartitioning") {
    val a = Packing.packOffsets(docs, buckets = 2, budgetTokens = 16L)
      .select("doc_id", "shard_seq").as[(Long, Long)].collect().toMap
    val b = Packing.packOffsets(docs.repartition(7), buckets = 2,
        budgetTokens = 16L)
      .select("doc_id", "shard_seq").as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
