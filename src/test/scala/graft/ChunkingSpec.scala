package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Chunking

class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed chunks: size 3, overlap 1 over 7 tokens") {
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Chunking.chunk(docs, chunkSize = 3, overlap = 1)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 3L, "a b c"),
      (1L, 2L, 3L, "c d e"),
      (2L, 4L, 3L, "e f g"),
      (3L, 6L, 1L, "g")))
  }

  test("dropping each chunk's overlap prefix reconstructs the document") {
    val docs = Seq(
      (1L, (1 to 53).map(i => s"t$i").mkString(" ")),
      (2L, "one two"),
      (3L, "solo")).toDF("doc_id", "text")
    val chunks = Chunking.chunk(docs, chunkSize = 8, overlap = 3)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Long, String)].collect()
    val rebuilt = chunks.groupBy(_._1).view.mapValues { cs =>
      cs.sortBy(_._2).zipWithIndex.flatMap { case ((_, _, text), i) =>
        val toks = text.split(" ").toSeq
        if (i == 0) toks else toks.drop(3)
      }.mkString(" ")
    }.toMap
    val original = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(rebuilt == original)
  }

  test("every chunk but the last is full-size; starts step by stride") {
    val docs = Seq((9L, (1 to 100).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Chunking.chunk(docs, chunkSize = 16, overlap = 4)
      .orderBy("chunk_idx")
      .select("start_tok", "n_chunk_tokens").as[(Long, Long)].collect()
    rows.zipWithIndex.foreach { case ((start, _), i) =>
      assert(start == i.toLong * 12)
    }
    assert(rows.init.forall(_._2 == 16L))
    assert(rows.last._2 <= 16L && rows.last._2 >= 1L)
  }

  test("null and empty text produce one empty chunk, not a crash") {
    val docs = Seq((1L, null: String), (2L, ""), (3L, "  "))
      .toDF("doc_id", "text")
    val got = Chunking.chunk(docs, chunkSize = 4, overlap = 0)
      .select("doc_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 1L, ""), (2L, 1L, ""), (3L, 1L, "")))
  }

  test("metadata columns pass through onto every chunk") {
    val docs = Seq((1L, "a b c d e", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Chunking.chunk(docs, chunkSize = 2, overlap = 0)
      .select("doc_id", "lang", "source", "chunk_idx", "chunk_text")
      .as[(Long, String, String, Long, String)].collect().toSet
    assert(got == Set(
      (1L, "en", "web", 0L, "a b"),
      (1L, "en", "web", 1L, "c d"),
      (1L, "en", "web", 2L, "e")))
  }

  test("metadata columns named pos/col/toks do not collide with internals") {
    val docs = Seq((1L, "a b c d", "NOUN", 7, "t"))
      .toDF("doc_id", "text", "pos", "col", "toks")
    val got = Chunking.chunk(docs, chunkSize = 2, overlap = 0)
      .select("doc_id", "pos", "col", "toks", "chunk_idx", "chunk_text")
      .as[(Long, String, Int, String, Long, String)].collect().toSet
    assert(got == Set(
      (1L, "NOUN", 7, "t", 0L, "a b"),
      (1L, "NOUN", 7, "t", 1L, "c d")))
  }

  test("chunking is a shuffle-free plan") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Chunking.chunk(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("parameter validation") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunk(docs, chunkSize = 0))
    intercept[IllegalArgumentException](
      Chunking.chunk(docs, chunkSize = 4, overlap = 4))
    intercept[IllegalArgumentException](
      Chunking.chunk(docs, chunkSize = 4, overlap = -1))
  }
}
