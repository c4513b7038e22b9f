package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.llm.LineDedup

/** Scale proof for corpus line-dedup (`dedup_lines_corpus`): plants
  * ONE banner line into half the corpus (the "every page carries the
  * same cookie notice" shape — the worst legitimate hot key this
  * operator meets) and shows both stages stay bounded:
  *
  *  1. `lineFrequencies`: the banner's copies collapse map-side —
  *     countDistinct plans as (line, doc)-keyed partial aggregation,
  *     so no reducer ever receives more than one row per (line, doc),
  *     and the second-phase count is itself partial-aggregated;
  *  2. `dedupCorpusLines`: the removed-line probe join puts the
  *     banner's n/2 exploded copies on one join key; AQE skew-join
  *     splitting (on in GraftSession) splits that partition, so the
  *     skewed run costs ~the clean run and the max-task/median-task
  *     ratio stays flat rather than scaling with the hot line's df.
  *
  * Prints task-time distribution (max / p50 / count) per measured job
  * from a listener, so "AQE handles it" is a recorded number, not a
  * claim. Run: `sbt "runMain graft.tools.LineSkewProbe [sfDir]"`;
  * the recorded run lives in SCALE_PROBES.md.
  */
object LineSkewProbe {

  private final class TaskStats extends SparkListener {
    val times = new scala.collection.mutable.ArrayBuffer[Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      times.synchronized { times += t.taskInfo.duration }
    def reset(): Unit = times.synchronized { times.clear() }
    def report(): String = times.synchronized {
      if (times.isEmpty) "n_tasks=0"
      else {
        val s = times.sorted
        f"n_tasks=${s.length} max_task_ms=${s.last} " +
          f"p50_task_ms=${s(s.length / 2)} " +
          f"skew_ratio=${s.last.toDouble / math.max(1L, s(s.length / 2))}%.1f"
      }
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
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)

    val banner = "This site uses cookies to improve your experience"
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val clean = docs.localCheckpoint(true)
    // the banner leads every even-id document — df = n/2
    val skewed = docs.select(
      col("doc_id"),
      when(col("doc_id") % 2 === 0, concat(lit(banner + "\n"), col("text")))
        .otherwise(col("text")).as("text"))
      .localCheckpoint(true)
    val n = clean.count()
    println(s"PROBE corpus sf=$sfDir n_docs=$n banner_df=${n / 2}")

    for ((label, d) <- Seq("clean" -> clean, "skewed" -> skewed)) {
      stats.reset()
      val (freqTop, tFreq) = timed {
        LineDedup.lineFrequencies(d)
          .orderBy(col("n_docs").desc).limit(1)
          .collect().headOption
          .map(r => s"${r.getLong(1)}").getOrElse("0")
      }
      println(f"PROBE line_freq $label top_df=$freqTop sec=$tFreq%.2f " +
        stats.report())

      stats.reset()
      val (row, tDedup) = timed {
        LineDedup.dedupCorpusLines(d, minDocFreq = 2)
          .agg(sum(col("n_removed")).as("removed"),
            sum(col("n_kept")).as("kept")).head()
      }
      println(f"PROBE dedup_lines $label removed=${row.getLong(0)} " +
        f"kept=${row.getLong(1)} sec=$tDedup%.2f " + stats.report())

      // span dedup on the same corpus: the banner contributes a run
      // of hot 8-token windows in half the docs — the window-keyed
      // analogue of the hot line (xxhash keys, covered-pos explode)
      stats.reset()
      val (srow, tSpan) = timed {
        graft.llm.SpanDedup.dedupCorpusSpans(d, windowLen = 8, minDf = 2)
          .agg(sum(col("n_removed")).as("removed"),
            sum(col("n_tokens")).as("toks")).head()
      }
      println(f"PROBE dedup_spans $label removed_tokens=${srow.getLong(0)} " +
        f"total_tokens=${srow.getLong(1)} sec=$tSpan%.2f " + stats.report())
    }
    spark.stop()
  }
}
