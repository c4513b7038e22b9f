package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Sampling

class TemperatureSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed mixture: 'big' 90% of tokens, 'small' 10%
  lazy val docs = {
    val big = (0 until 90).map(i => (i.toLong, ("w " * 10).trim, "big"))
    val small = (1000 until 1010).map(i =>
      (i.toLong, ("v " * 10).trim, "small"))
    (big ++ small).toDF("doc_id", "text", "source")
  }

  private def keptFrac(budget: Long, source: String): Double = {
    val out = Sampling.temperatureSample(docs, budget)
    val n = out.filter(col("source") === source).count().toDouble
    val total = docs.filter(col("source") === source).count().toDouble
    n / total
  }

  test("alpha=1/2 softening: small source keeps a larger fraction") {
    // proportional sampling would keep the same fraction of both;
    // temperature keep_threshold ~ 1/sqrt(share) favors 'small'
    val fracSmall = keptFrac(300L, "small")
    val fracBig = keptFrac(300L, "big")
    assert(fracSmall > fracBig,
      s"small kept $fracSmall, big kept $fracBig — no softening")
  }

  test("budget zero keeps nothing; huge budget keeps everything") {
    assert(Sampling.temperatureSample(docs, 0L).isEmpty)
    assert(Sampling.temperatureSample(docs, 1000000L).count() == 100)
  }

  test("kept tokens stay in the neighborhood of the budget") {
    val out = Sampling.temperatureSample(docs, 300L)
    val toks = out.agg(sum(graft.llm.TextAnalysis.tokenCount(col("text"))))
      .head().getLong(0)
    // hash noise and integer flooring bound, not exact equality
    assert(toks > 0 && toks <= 3 * 300, s"kept $toks tokens on budget 300")
  }

  test("kept set is deterministic and repartition-invariant") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureSample(df, 300L)
        .select("doc_id").as[Long].collect().toSet
    val a = ids(docs)
    assert(a == ids(docs.repartition(7)))
    assert(a == ids(docs))
  }

  test("NULL source is a real group, not silently dropped") {
    val withNull = docs.union(
      Seq((5000L, "x y", null: String), (5001L, "z", null: String))
        .toDF("doc_id", "text", "source"))
    assert(Sampling.temperatureSample(withNull, 1000000L).count() == 102)
  }

  test("sampling is a subset: no row is invented or mutated") {
    val out = Sampling.temperatureSample(docs, 300L)
      .select("doc_id", "text", "source").as[(Long, String, String)]
      .collect().toSet
    val full = docs.select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().toSet
    assert(out.subsetOf(full))
  }
}
