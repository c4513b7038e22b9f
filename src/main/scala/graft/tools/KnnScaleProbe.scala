package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.llm.Similarity

/** Scale proof for the bounded batch k-NN plan (`ann_knn_join` /
  * `ann_hard_negatives`): runs the collect_top_k formulation of
  * [[Similarity.knnJoin]] against the window-rank formulation it
  * replaced, on the same corpus and a LARGE query batch (the regime
  * the round-9 audit flagged: with W queries every map partition
  * scores |part|×W rows, and the window plan must SORT that frame
  * per task before its partial group limit, while the heap plan does
  * O(n) pushes into W k-sized heaps).
  *
  * Reports wall time, shuffle records/bytes written, and task spill
  * per variant from a listener, plus a row-set equality check — so
  * "same rows, bounded exchange, no sort" is a recorded number.
  * Run: `sbt "runMain graft.tools.KnnScaleProbe [sfDir [nQueries]]"`;
  * the recorded run lives in SCALE_PROBES.md.
  */
object KnnScaleProbe {

  private final class JobMetrics extends SparkListener {
    var records = 0L; var bytes = 0L; var spill = 0L; var tasks = 0
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      synchronized {
        val m = t.taskMetrics
        if (m != null) {
          records += m.shuffleWriteMetrics.recordsWritten
          bytes += m.shuffleWriteMetrics.bytesWritten
          spill += m.diskBytesSpilled + m.memoryBytesSpilled
          tasks += 1
        }
      }
    def reset(): Unit = synchronized { records = 0; bytes = 0; spill = 0; tasks = 0 }
    def report(): String = synchronized {
      s"shuffle_records=$records shuffle_bytes=$bytes spill_bytes=$spill n_tasks=$tasks"
    }
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(1000)
    // corpus multiplier: replicate the fixture with offset ids so the
    // scored frame reaches the regime where the window plan's
    // per-task sort visibly diverges from the heap
    val mult = args.lift(2).map(_.toInt).getOrElse(1)
    val k = 10
    val metrics = new JobMetrics
    spark.sparkContext.addSparkListener(metrics)

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
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .localCheckpoint(true)
    val n = emb.count()
    println(s"PROBE corpus sf=$sfDir n_vectors=$n n_queries=$nQueries k=$k " +
      s"scored_rows=${n * nQueries}")

    // the replaced formulation: rank the raw scored frame per query
    import org.apache.spark.sql.expressions.Window
    def windowPlan() = {
      val scored = emb
        .crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("q_vec")), 4)
            .as("cos_sim"))
      scored.withColumn("rank", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("cos_sim").desc, col("vec_id"))))
        .filter(col("rank") <= k)
    }

    // warm both paths once (scan caches, codegen) before timing
    windowPlan().count()
    Similarity.knnJoin(queries, emb, k = k).count()

    metrics.reset()
    val (nWin, tWin) = timed(windowPlan().count())
    println(f"PROBE window_rank rows=$nWin sec=$tWin%.2f " + metrics.report())

    metrics.reset()
    val (nHeap, tHeap) = timed(
      Similarity.knnJoin(queries, emb, k = k).count())
    println(f"PROBE topk_heap rows=$nHeap sec=$tHeap%.2f " + metrics.report())

    val diff = Similarity.knnJoin(queries, emb, k = k)
      .select("q_id", "vec_id", "cos_sim", "rank")
      .exceptAll(windowPlan().select("q_id", "vec_id", "cos_sim", "rank"))
      .count()
    println(s"PROBE row_equality except_all_diff=$diff")

    // round-14 addition: the IVF-pruned batch join — same heap
    // top-k, but each corpus row scores only against the queries
    // probing its list, so the scored-pair count falls to
    // ≈ nprobe/nlist of brute force (recall cost recorded by the
    // ann_ivf_recall oracle row)
    val (nlist, iters) = (8, 2)
    for (nprobe <- Seq(1, 2)) {
      Similarity.ivfKnnJoin(queries, emb, k = k, nlist = nlist,
        iters = iters, nprobe = nprobe).count() // warm (incl. training)
      metrics.reset()
      val (nIvf, tIvf) = timed(
        Similarity.ivfKnnJoin(queries, emb, k = k, nlist = nlist,
          iters = iters, nprobe = nprobe).count())
      println(f"PROBE ivf_knn nprobe=$nprobe/$nlist rows=$nIvf " +
        f"sec=$tIvf%.2f (train+search) " + metrics.report())
    }
    spark.stop()
  }
}
