package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Sampling

class BudgetSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two sources: 'big' has 40 docs x 10 tokens = 400; 'small' 5 x 4 = 20
  lazy val docs = {
    val big = (0 until 40).map(i =>
      (i.toLong, ("w " * 10).trim, "big"))
    val small = (100 until 105).map(i =>
      (i.toLong, "a b c d", "small"))
    (big ++ small).toDF("doc_id", "text", "source")
  }

  test("a source under budget passes through whole") {
    val out = Sampling.tokenBudgetSample(docs, budgetTokensPerSource = 100L)
    assert(out.filter(col("source") === "small").count() == 5)
  }

  test("an oversized source shrinks toward the budget") {
    val out = Sampling.tokenBudgetSample(docs, budgetTokensPerSource = 100L)
    val kept = out.filter(col("source") === "big").count()
    // threshold = 100/400 => expect ~10 of 40 docs; hash noise bounded
    assert(kept > 0 && kept < 40, s"kept $kept of 40")
    val toks = kept * 10
    assert(toks <= 3 * 100, s"kept $toks tokens against budget 100")
  }

  test("budget zero keeps nothing; huge budget keeps everything") {
    assert(Sampling.tokenBudgetSample(docs, 0L).isEmpty)
    assert(Sampling.tokenBudgetSample(docs, 1000000L).count() == 45)
  }

  test("kept set is deterministic and repartition-invariant") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.tokenBudgetSample(df, 100L)
        .select("doc_id").as[Long].collect().toSet
    val a = ids(docs)
    assert(a == ids(docs.repartition(7)))
    assert(a == ids(docs))
  }

  test("NULL source is a real group, not silently dropped") {
    val withNull = docs.union(
      Seq((200L, "x y", null: String), (201L, "z", null: String))
        .toDF("doc_id", "text", "source"))
    // huge budget: EVERY document passes through, including source=NULL
    assert(Sampling.tokenBudgetSample(withNull, 1000000L).count() == 47)
    // and the NULL group budgets independently like any other source
    val kept = Sampling.tokenBudgetSample(withNull, 2L)
      .filter(col("source").isNull).count()
    assert(kept <= 2)
  }

  test("sampling is a subset: no row is invented or mutated") {
    val out = Sampling.tokenBudgetSample(docs, 100L)
      .select("doc_id", "text", "source").as[(Long, String, String)]
      .collect().toSet
    val full = docs.select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().toSet
    assert(out.subsetOf(full))
  }
}
