package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.llm.Retrieval

/** Dev diagnostic: does the batch hybrid-retrieval design actually
  * amortize? [[Retrieval.hybridTopK]] claims one tf/df pass over the
  * union of all queries' terms plus one dense scan serves the WHOLE
  * query batch — so wall time per query should fall roughly linearly
  * with batch size (until the per-(query,token) fan-out dominates),
  * where a per-query loop would be flat. This measures min-of-3 wall
  * time at batch sizes 1/8/64 over the same corpus, live and against
  * a persisted BM25 index.
  *
  * Run: `sbt "runMain graft.tools.HybridScaleProbe [sfDir]"`;
  * recorded in SCALE_PROBES.md.
  */
object HybridScaleProbe {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, sfDir).localCheckpoint(true)
    val n = docs.count()

    // deterministic query texts drawn from fixture-frequent terms so
    // every batch size exercises real lexical hits
    val vocab = Seq("hash", "merge", "scan", "join", "filter", "index",
      "sort", "group", "order", "table", "query", "plan")
    def queryText(i: Int): String =
      Seq(vocab(i % vocab.size), vocab((i / 3 + 1) % vocab.size),
        vocab((i / 7 + 5) % vocab.size)).mkString(" ")

    val idxPath = java.nio.file.Files
      .createTempDirectory("hybrid_probe_bm25").toString
    val (_, tBuild) = timed(Retrieval.writeBm25Index(docs, idxPath))
    println(f"PROBE hybrid corpus=$n bm25_index_build_once sec=$tBuild%.2f")
    val densePath = java.nio.file.Files
      .createTempDirectory("hybrid_probe_dense").toString
    val (_, tDense) = timed(Retrieval.writeDenseIndex(docs, densePath))
    println(f"PROBE hybrid corpus=$n dense_index_build_once sec=$tDense%.2f")

    for (nq <- Seq(1, 8, 64)) {
      val qs = (0 until nq).map(i => (i, queryText(i)))
        .toDF("query_id", "query_text")
        .localCheckpoint(true)
      def live() =
        Retrieval.hybridTopK(docs, qs, k = 10, nPerSide = 20).count()
      def indexed() = Retrieval.hybridTopKIndexed(
        spark, idxPath, docs, qs, k = 10, nPerSide = 20).count()
      def fully() = Retrieval.hybridTopKFullyIndexed(
        spark, idxPath, densePath, qs, k = 10, nPerSide = 20).count()
      live(); indexed(); fully() // codegen + plan warm
      val tL = (1 to 3).map(_ => timed(live())._2).min
      val tI = (1 to 3).map(_ => timed(indexed())._2).min
      val tF = (1 to 3).map(_ => timed(fully())._2).min
      println(f"PROBE hybrid nq=$nq%-3d live_min_sec=$tL%.2f " +
        f"per_query=${tL / nq}%.4f indexed_min_sec=$tI%.2f " +
        f"per_query_indexed=${tI / nq}%.4f fully_min_sec=$tF%.2f " +
        f"per_query_fully=${tF / nq}%.4f")
    }
    spark.stop()
  }
}
