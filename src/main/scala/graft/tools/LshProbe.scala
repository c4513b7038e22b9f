package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.llm.Similarity

/** Diagnostic for the `ann_lsh_topk` superset-prune oracle: measures,
  * per fixture SF and candidate widths K′, how many of the LSH top-10
  * fall OUTSIDE the exact brute-force top-K′. The oracle asserts
  * n_outside = 0 at K′ = 100; this probe is the evidence (the LSH
  * hyperplane seed is fixed, so the result is deterministic per
  * fixture). Re-run after changing LSH parameters or fixtures:
  *
  *   sbt "runMain graft.tools.LshProbe [sfDir...]"
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (d <- dirs) {
      val emb = Tables.embeddings(spark, d)
      val query = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_vec"))
      val lsh = Similarity.lshTopK(emb, query, k = 10, excludeId = 0L)
      for (kp <- Seq(20, 50, 100)) {
        val bf = Similarity.bruteForceTopK(emb, query, k = kp, excludeId = 0L)
        val outside = lsh.join(bf.select("vec_id"), Seq("vec_id"), "left_anti")
          .count()
        println(s"PROBE $d k'=$kp lsh_returned=${lsh.count()} n_outside=$outside")
      }
    }
    spark.stop()
  }
}
