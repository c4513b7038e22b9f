package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.llm.{Quantize, Similarity}

/** Scale proof for the IVF-PQ serving path (`ann_ivfpq_topk`): at a
  * multiplied corpus, records (a) the probed FRACTION — the share of
  * the corpus that reaches ADC scoring after the coarse-quantizer
  * list filter, which is the whole point of IVF (≈ nprobe/nlist,
  * modulo cluster imbalance); (b) end-to-end wall time of the full
  * PQ ADC scan vs the composed IVF-PQ call at several nprobe values
  * (the composed call RE-TRAINS Lloyd each time — the honest one-call
  * cost; at serving scale training and coarse assignment are
  * precomputed once, so the probed fraction is the per-query cost
  * model); and (c) a correctness anchor — nprobe = nlist must return
  * exactly the full-ADC top-k minus the excluded query row.
  *
  * Run: `sbt "runMain graft.tools.IvfPqScaleProbe [sfDir [mult]]"`;
  * the recorded run lives in SCALE_PROBES.md.
  */
object IvfPqScaleProbe {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(8)
    val (nlist, iters, k) = (8, 2, 10)

    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val emb = (if (mult <= 1) base
      else base
        .crossJoin(broadcast(
          spark.range(mult).select(col("id").as("rep"))))
        .select(
          (col("vec_id") + col("rep") * 10000000L).as("vec_id"),
          col("embedding"))
        .repartition(32))
      .localCheckpoint(true)
    val n = emb.count()
    val qVec = base.filter(col("vec_id") === 7)
      .select(col("embedding")).collect().head
      .getSeq[Float](0).map(_.toDouble).toArray
    println(s"PROBE corpus sf=$sfDir mult=$mult n_vectors=$n " +
      s"nlist=$nlist k=$k")

    // (a) probed fraction: how much of the corpus survives the list
    // filter — the serving-time per-query cost model
    val assign = Similarity.kmeansAssign(emb, k = nlist, iters = iters)
      .select(col("vec_id"), col("cluster_id"))
      .localCheckpoint(true)
    val sizes = assign.groupBy("cluster_id").count()
      .orderBy(col("count").desc)
      .collect().map(r => r.getLong(1))
    println(s"PROBE cluster_sizes ${sizes.mkString(",")}")
    for (nprobe <- Seq(1, 2, 4)) {
      // the probe set the engine would pick: top-nprobe lists by
      // query cosine — recompute the ranking the same way
      val probed = Quantize.ivfPqTopK(emb, qVec, topK = n.toInt,
        nlist = nlist, iters = iters, nprobe = nprobe, excludeId = 7L)
        .count()
      println(f"PROBE probed nprobe=$nprobe rows=$probed " +
        f"fraction=${probed.toDouble / n}%.3f " +
        f"ideal=${nprobe.toDouble / nlist}%.3f")
    }

    // (b) wall time: full ADC vs composed IVF-PQ (train included)
    Quantize.pqTopK(emb, qVec, topK = k).count() // warm
    val (_, tFull) = timed(Quantize.pqTopK(emb, qVec, topK = k).count())
    println(f"PROBE pq_full_adc sec=$tFull%.2f")
    for (nprobe <- Seq(1, 2)) {
      val (_, t) = timed(Quantize.ivfPqTopK(emb, qVec, topK = k,
        nlist = nlist, iters = iters, nprobe = nprobe,
        excludeId = 7L).count())
      println(f"PROBE ivfpq nprobe=$nprobe sec=$t%.2f (train+search)")
    }

    // (b2) the serving path: training + codebook + coarse assignment
    // amortized into a persisted index (writePqIndex); per-query cost
    // is the probed fraction × m code lookups, nothing retrained
    val idxPath = java.nio.file.Files
      .createTempDirectory("ivfpq_probe_index").toString
    val (_, tBuild) = timed(Quantize.writePqIndex(
      emb, idxPath, nlist = nlist, iters = iters))
    println(f"PROBE index_build sec=$tBuild%.2f (once, amortized)")
    Quantize.ivfPqTopKIndexed(spark, idxPath, qVec, topK = k,
      nprobe = 1, excludeId = 7L).count() // warm
    for (nprobe <- Seq(1, 2)) {
      val (_, t) = timed(Quantize.ivfPqTopKIndexed(spark, idxPath,
        qVec, topK = k, nprobe = nprobe, excludeId = 7L).count())
      println(f"PROBE ivfpq_indexed nprobe=$nprobe sec=$t%.2f (search only)")
    }
    val (_, tAdcIdx) = timed(Quantize.pqTopKIndexed(spark, idxPath,
      qVec, topK = k).count())
    println(f"PROBE pq_indexed_full_adc sec=$tAdcIdx%.2f (search only)")
    // indexed ≡ live at the probe scale
    val liveTop = Quantize.ivfPqTopK(emb, qVec, topK = k,
      nlist = nlist, iters = iters, nprobe = 2, excludeId = 7L)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    val idxTop = Quantize.ivfPqTopKIndexed(spark, idxPath, qVec,
      topK = k, nprobe = 2, excludeId = 7L)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    println(s"PROBE indexed_equality match=${idxTop == liveTop}")

    // (c) correctness anchor: nprobe = nlist ≡ exact ADC minus query
    val full = Quantize.pqTopK(emb, qVec, topK = k + 1)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._1 != 7L).take(k)
    val ivf = Quantize.ivfPqTopK(emb, qVec, topK = k, nlist = nlist,
      iters = iters, nprobe = nlist, excludeId = 7L)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    println(s"PROBE degrade_equality match=${ivf == full}")
    spark.stop()
  }
}
