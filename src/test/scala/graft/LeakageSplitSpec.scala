package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Sampling

class LeakageSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 30 distinct docs (unique token sets — no accidental near-dups) plus
  // a 3-member exact-duplicate family at ids chosen at runtime so their
  // PER-ID splits genuinely differ (the leakage the operator prevents).
  lazy val dupIds: Seq[Long] = {
    val buckets = spark.range(0, 200)
      .select(col("id"), Sampling.bucket(col("id")).as("b"))
      .as[(Long, Long)].collect()
    def split(b: Long) = if (b < 80) "train" else if (b < 90) "val" else "test"
    val bynm = buckets.groupBy { case (_, b) => split(b) }
    val train = bynm("train").map(_._1)
    val test = bynm.getOrElse("test", bynm("val")).map(_._1)
    Seq(train.head, train.last, test.head)
  }

  lazy val docs = {
    val dupText = "the same duplicated document body repeated verbatim here"
    val distinct = (0 until 30)
      .map(i => (1000L + i, s"alpha$i beta$i gamma$i delta$i epsilon$i"))
    (distinct ++ dupIds.map(_ -> dupText)).toDF("doc_id", "text")
  }

  test("every near-dup cluster lands in exactly one split") {
    val out = Sampling.leakageSafeSplit(docs)
    val spanning = out.filter(col("cluster").isNotNull)
      .groupBy("cluster").agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1)
    assert(spanning.isEmpty,
      s"cluster straddles splits:\n${spanning.collect().mkString("\n")}")
    // the fixture is adversarial: per-id assignment WOULD have straddled
    val perId = Sampling.assignSplit(
      docs.filter(col("doc_id").isin(dupIds: _*)))
    assert(perId.select("split").distinct().count() > 1,
      "fixture not adversarial: per-id splits agree by chance")
  }

  test("documents without near-dups keep their per-id assignment") {
    val out = Sampling.leakageSafeSplit(docs)
      .filter(col("cluster").isNull).select("doc_id", "split")
    val plain = Sampling.assignSplit(docs)
      .select(col("doc_id"), col("split").as("plain_split"))
    val disagree = out.join(plain, "doc_id")
      .filter(col("split") =!= col("plain_split"))
    assert(disagree.isEmpty,
      s"singleton diverged:\n${disagree.collect().mkString("\n")}")
    assert(out.count() == 30)
  }

  test("clean corpus (zero near-dup pairs) equals the plain split") {
    val clean = docs.filter(col("doc_id") >= 1000L)
    val out = Sampling.leakageSafeSplit(clean)
    assert(out.filter(col("cluster").isNotNull).isEmpty)
    val plain = Sampling.assignSplit(clean)
      .select(col("doc_id"), col("split").as("plain_split"))
    assert(out.join(plain, "doc_id")
      .filter(col("split") =!= col("plain_split")).isEmpty)
  }
}
