package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.llm.{Quantize, Similarity}

/** Recall operating-point for the PERSISTED IVF-PQ index (VERDICT r14
  * #4): `ann_ivf_recall` measured 0.6–1.0 recall@10 at sf0.01 through
  * the LIVE path — thin evidence for a serving default. This probe
  * measures, at sf0.1 (or any sfDir) through the PERSISTED index and
  * the index-served BATCH join, the full recall-vs-nprobe curve:
  *
  *   - recall@10 vs the EXACT float top-10 (total loss: coarse-probe
  *     pruning + PQ quantization),
  *   - recall@10 vs the FULL-ADC top-10 (probe-pruning loss alone —
  *     what nprobe actually controls; the PQ floor is the nprobe =
  *     nlist row),
  *   - min-of-3 wall time per batch probe (20 queries/plan).
  *
  * Run: `sbt "runMain graft.tools.RecallProbe [sfDir [nlist]]"`; the
  * recorded run and the chosen serving default live in
  * SCALE_PROBES.md and the [[Quantize.ivfPqTopKIndexed]] scaladoc.
  */
object RecallProbe {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nlist = args.lift(1).map(_.toInt).getOrElse(8)
    val nQueries = 20
    val k = 10

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .localCheckpoint(true)
    println(s"PROBE recall corpus=$n nlist=$nlist queries=$nQueries k=$k")

    val idx = java.nio.file.Files
      .createTempDirectory("recall_probe_idx").toString
    val (_, tBuild) = timed {
      Quantize.writePqIndex(emb, idx, nlist = nlist, iters = 2,
        m = 8, k = 16)
    }
    println(f"PROBE recall index_build_once sec=$tBuild%.2f")

    // ground truths: exact float top-10, and full-ADC top-10 (the PQ
    // floor — what nprobe = nlist returns)
    val exact = Similarity.knnJoin(queries, emb, k = k)
      .select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullAdc = Quantize
      .ivfPqKnnJoinIndexed(spark, idx, queries, k = k, nprobe = nlist)
      .select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (nprobe <- Seq(1, 2, 4, nlist).distinct.filter(_ <= nlist)) {
      def run() = Quantize
        .ivfPqKnnJoinIndexed(spark, idx, queries, k = k, nprobe = nprobe)
      val got = run().select("q_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      run().count() // warm
      val t = (1 to 3).map(_ => timed(run().count())._2).min
      val rExact = got.intersect(exact).size.toDouble / exact.size
      val rAdc = got.intersect(fullAdc).size.toDouble / fullAdc.size
      println(f"PROBE recall nprobe=$nprobe/$nlist " +
        f"recall_vs_exact=$rExact%.3f recall_vs_full_adc=$rAdc%.3f " +
        f"batch_min_sec=$t%.2f")

      // the same probe budget through the exact re-rank (refine)
      // stage: quantization loss removed, probe-pruning loss remains
      def runR() = Quantize.ivfPqKnnJoinIndexedReranked(
        spark, idx, emb, queries, k = k, nprobe = nprobe,
        shortlistFactor = 4)
      val gotR = runR().select("q_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      runR().count() // warm
      val tR = (1 to 3).map(_ => timed(runR().count())._2).min
      val rRExact = gotR.intersect(exact).size.toDouble / exact.size
      println(f"PROBE recall nprobe=$nprobe/$nlist reranked4x " +
        f"recall_vs_exact=$rRExact%.3f batch_min_sec=$tR%.2f")
    }
    spark.stop()
  }
}
