package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.llm.Quantize

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
    val pqK = args.lift(2).map(_.toInt).getOrElse(16) // codebook size
    val nQueries = 20
    val k = 10

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .localCheckpoint(true)
    println(s"PROBE recall corpus=$n nlist=$nlist pq_k=$pqK " +
      s"queries=$nQueries k=$k")

    val idx = java.nio.file.Files
      .createTempDirectory("recall_probe_idx").toString
    val (_, tBuild) = timed {
      Quantize.writePqIndex(emb, idx, nlist = nlist, iters = 2,
        m = 8, k = pqK)
    }
    println(f"PROBE recall index_build_once sec=$tBuild%.2f")

    // ground truths: exact float top-10 in the SAME metric ADC ranks
    // by (squared L2 — knnJoin's cosine would conflate metric
    // disagreement with quantization loss), and full-ADC top-10 (the
    // PQ floor — what nprobe = nlist returns)
    // all (query, corpus) true squared-L2 distances — the ground
    // truth AND the lookup for the distance-ratio metric below
    // (bounded: nQueries × corpus rows, a probe-scale collect)
    val allDists: Map[(Long, Long), Double] = {
      val qx = queries.select(col("q_id"),
        transform(col("q_vec"), x => x.cast("double")).as("qv"))
      emb.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .crossJoin(broadcast(qx))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          aggregate(zip_with(col("v"), col("qv"),
            (a, b) => (a - b) * (a - b)), lit(0.0), (s, e) => s + e)
            .as("d"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    val exactRows: Map[Long, Seq[(Long, Double)]] = allDists.toSeq
      .map { case ((q, v), d) => (q, v, d) }
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(p => (p._2, p._1))
        .take(k)).toMap
    val exact = exactRows.flatMap { case (q, vs) =>
      vs.map(v => (q, v._1)) }.toSet
    val exactDistSum = exactRows.values.flatten.map(_._2).sum
    // distance ratio: Σ true-dist(returned) / Σ true-dist(exact
    // top-k) — 1.0 means the misses are ties in disguise; large
    // means genuinely worse neighbors
    def distRatio(got: Set[(Long, Long)]): Double =
      got.toSeq.map(allDists).sum / exactDistSum
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
        f"dist_ratio=${distRatio(got)}%.3f batch_min_sec=$t%.2f")

      // the same probe budget through the exact re-rank (refine)
      // stage, at two shortlist factors: end recall = the exact
      // top-10's containment in the ADC top-(factor·k), so the
      // factor is the recovery lever when quantization (not probe
      // pruning) is the loss
      for (factor <- Seq(4, 16)) {
        def runR() = Quantize.ivfPqKnnJoinIndexedReranked(
          spark, idx, emb, queries, k = k, nprobe = nprobe,
          shortlistFactor = factor)
        val gotR = runR().select("q_id", "vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        runR().count() // warm
        val tR = (1 to 3).map(_ => timed(runR().count())._2).min
        val rRExact = gotR.intersect(exact).size.toDouble / exact.size
        println(f"PROBE recall nprobe=$nprobe/$nlist reranked${factor}x " +
          f"recall_vs_exact=$rRExact%.3f " +
          f"dist_ratio=${distRatio(gotR)}%.3f batch_min_sec=$tR%.2f")
      }
    }
    spark.stop()
  }
}
