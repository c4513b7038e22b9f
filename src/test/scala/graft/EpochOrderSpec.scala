package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Sampling

class EpochOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = (0L until 1000L).map(i => (i, s"doc $i"))
    .toDF("doc_id", "text")

  test("same seed reproduces the exact order; new seed re-shuffles") {
    def order(seed: String): Seq[Long] =
      Sampling.trainingOrder(docs, seed = seed, numShards = 8)
        .orderBy("sort_key", "doc_id").select("doc_id")
        .as[Long].collect().toSeq
    val e0 = order("epoch0")
    assert(e0 == order("epoch0"))
    val e1 = order("epoch1")
    assert(e0 != e1, "different seeds produced the same permutation")
    assert(e0.sorted == e1.sorted)
    assert(e0 != (0L until 1000L).toSeq, "order is not shuffled at all")
  }

  test("shards are balanced by the uniform hash") {
    val sizes = Sampling.trainingOrder(docs, numShards = 8)
      .groupBy("shard").count().select("count").as[Long].collect()
    assert(sizes.length == 8)
    assert(sizes.forall(n => n > 60 && n < 250), sizes.mkString(","))
  }

  test("assignment is repartition-invariant") {
    val a = Sampling.trainingOrder(docs, numShards = 16)
      .select("doc_id", "shard", "sort_key")
      .as[(Long, Long, Long)].collect().toSet
    val b = Sampling.trainingOrder(docs.repartition(13), numShards = 16)
      .select("doc_id", "shard", "sort_key")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
