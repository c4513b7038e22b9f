package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Retrieval

class RagRetrieveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hashEmbed: counts land in text_hash buckets, sum = token count") {
    // text_hash("a") = 97 -> bucket 97 % 16 = 1
    val v = spark.range(1)
      .select(Retrieval.hashEmbed(lit("a"), 16).as("v"))
      .as[Seq[Double]].head()
    assert(v.length == 16)
    assert(v(1) == 1.0 && v.sum == 1.0)
    val v2 = spark.range(1)
      .select(Retrieval.hashEmbed(lit("a b c a"), 16).as("v"))
      .as[Seq[Double]].head()
    assert(v2.sum == 4.0)
  }

  test("hashEmbedTokens == hashEmbed on mixed-case text") {
    // whitespace token boundaries are case-independent, so the
    // per-token lower() in the array path must give identical vectors
    val text = "  Hash JOIN merge   MERGE  "
    val (a, b) = spark.range(1)
      .select(
        Retrieval.hashEmbed(lit(text), 16).as("a"),
        Retrieval.hashEmbedTokens(split(trim(lit(text)), "\\s+"), 16).as("b"))
      .as[(Seq[Double], Seq[Double])].head()
    assert(a == b, s"$a vs $b")
  }

  test("a chunk that is exactly the query scores cosine 1.0 at rank 1") {
    val docs = Seq(
      (1L, "needle in the stack"),
      (2L, "hash join merge"),
      (3L, "completely unrelated words here")).toDF("doc_id", "text")
    val top = Retrieval.ragRetrieve(docs, "hash join merge", k = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(top.head._1 == 2L && top.head._3 == 1.0, top.toString)
    // descending, deterministic tie-break
    assert(top.map(-_._3) == top.map(-_._3).sorted)
  }

  test("chunking feeds retrieval: long docs yield per-chunk hits") {
    // 64 tokens -> two chunks of 32 at overlap 0; only chunk 1
    // contains the query terms
    val text = (("x " * 32) + "hash join merge " + ("y " * 29)).trim
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val top = Retrieval.ragRetrieve(docs, "hash join merge", k = 1)
      .as[(Long, Long, Double)].head()
    assert(top._1 == 7L && top._2 == 1L, top.toString)
  }

  test("case-insensitive and null-safe") {
    val docs = Seq(
      (1L, "HASH Join MERGE"), (2L, null: String)).toDF("doc_id", "text")
    val top = Retrieval.ragRetrieve(docs, "hash join merge", k = 1)
      .as[(Long, Long, Double)].head()
    assert(top._1 == 1L && top._3 == 1.0)
  }

  test("one exchange only: the top-k; chunk+embed are narrow") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Retrieval.ragRetrieve(docs, "a", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
