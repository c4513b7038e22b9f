package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.llm.SpanDedup

/** Scale proof for span-level decontamination
  * (`SpanDedup.decontaminateSpans`): its cost must be
  * one corpus window pass (codegen explode + broadcast semi-join)
  * plus reassembly work proportional to the CONTAMINATED slice only —
  * not to the corpus. Method: replicate the sf0.1 documents M× with a
  * per-replica consonant substitution (`translate`), so replicas
  * share no token windows; the bench set is 20 replica-0 texts →
  * exactly 20 corpus documents are contaminated at ANY multiplier.
  * For contrast, `dedupCorpusSpans` on the same corpus derives its
  * hot set from the corpus itself and reassembles EVERY document —
  * the corpus-keyed shape decontamination must not degenerate into.
  *
  * Run: `sbt "runMain graft.tools.DeconSpanProbe [sfDir [mults]]"`.
  * Output lines are `PROBE <case> k=v ...`; the recorded run lives in
  * SCALE_PROBES.md.
  */
object DeconSpanProbe {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.lift(1).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(4, 16))
    val consonants = "bcdfghjklmnpqrstvwxz"

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val bench = docs.filter(col("doc_id") < 20)
      .localCheckpoint(true)

    mults.foreach { m =>
      require(m <= 16, "consonant rotation table supports m <= 16")
      val corpus = (0 until m).map { r =>
        val sub = consonants.substring(r, r + 5)
        docs.select(
          (col("doc_id") + lit(r * 100000000L)).as("doc_id"),
          (if (r == 0) col("text")
           else translate(col("text"), "aeiou", sub)).as("text"))
      }.reduce(_ unionByName _).localCheckpoint(true)
      val nCorpus = corpus.count()

      val (deconStats, tDecon) = timed {
        val out = SpanDedup.decontaminateSpans(corpus, bench, windowLen = 8)
        out.agg(count(lit(1)), count(when(col("n_removed") > 0, 1)))
          .head()
      }
      val (fullStats, tFull) = timed {
        SpanDedup.dedupCorpusSpans(corpus, windowLen = 8, minDf = 2)
          .agg(count(lit(1)), count(when(col("n_removed") > 0, 1)))
          .head()
      }
      println(f"PROBE decon_spans mult=$m corpus=$nCorpus " +
        f"decon_docs_hit=${deconStats.getLong(1)} " +
        f"decon_sec=$tDecon%.2f " +
        f"fullspan_docs_hit=${fullStats.getLong(1)} " +
        f"fullspan_sec=$tFull%.2f")
    }
    spark.stop()
  }
}
