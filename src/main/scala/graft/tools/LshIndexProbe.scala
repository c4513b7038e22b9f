package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.llm.Dedup

/** Scale proof for the persisted LSH index (`Dedup.writeLshIndex` /
  * `incrementalDedupIndexed`): the onboarding loop probes the SAME
  * frozen reference with every incoming batch, so the question that
  * matters at 100 TB is what one probe costs as the reference grows.
  *
  * Method: replicate the sf0.1 documents table M× (re-id'd — the
  * "reference corpus grew M×" shape), onboard a fixed 500-doc batch
  * (100 planted exact copies + 50 near-dups + 350 fresh), three ways:
  *
  *  1. live `incrementalDedup` — re-reads, re-tokenizes, re-shingles
  *     and re-minhashes the reference EVERY batch;
  *  2. `writeLshIndex` — the one-time build (amortized across every
  *     future batch);
  *  3. `incrementalDedupIndexed` — per-batch probe against the stored
  *     digests/bands, reference text untouched.
  *
  * Recorded at two multipliers so the growth curve (not one point) is
  * the artifact: live cost grows with the reference's TEXT volume,
  * probe cost only with its (8-byte-keyed) band/digest tables. Kept
  * sets are asserted identical between the paths at each multiplier.
  *
  * Run: `sbt "runMain graft.tools.LshIndexProbe [sfDir [mults]]"`.
  * Output lines are `PROBE <case> k=v ...`; the recorded run lives in
  * SCALE_PROBES.md.
  */
object LshIndexProbe {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.lift(1).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(4, 16))

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val nBase = docs.count()

    mults.foreach { m =>
      // reference corpus grown m×: replica r re-ids by r * 10^8
      val reference = (0 until m).map(r =>
        docs.select((col("doc_id") + lit(r * 100000000L)).as("doc_id"),
          col("text")))
        .reduce(_ unionByName _)
        .localCheckpoint(true) // freeze: build cost ≠ fixture-gen cost
      val nRef = reference.count()

      // fixed incoming batch: 100 exact copies, 50 near-dups (one
      // word appended), 350 fresh docs
      val exact = docs.filter(col("doc_id") < 100)
        .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      val near = docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          concat(col("text"), lit(" zzznearnoise")).as("text"))
      val fresh = spark.range(350).select(
        (col("id") + 950000000L).as("doc_id"),
        concat(lit("entirely fresh probe document number "),
          col("id").cast("string"),
          lit(" with unique vocabulary qqq www eee rrr ttt ")).as("text"))
      val incoming = exact.unionByName(near).unionByName(fresh)
        .localCheckpoint(true)

      val (liveKept, tLive) = timed {
        Dedup.incrementalDedup(incoming, reference)
          .select("doc_id").as[Long].collect().toSet
      }

      val idxPath = s"target/probe_lsh_index_m$m"
      val fs = new org.apache.hadoop.fs.Path(idxPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(idxPath), true)
      val (_, tBuild) = timed {
        Dedup.writeLshIndex(reference, idxPath)
      }

      val (idxKept, tProbe) = timed {
        Dedup.incrementalDedupIndexed(incoming, idxPath)
          .select("doc_id").as[Long].collect().toSet
      }

      assert(idxKept == liveKept,
        s"indexed kept set diverged at m=$m: " +
          s"only-live=${(liveKept -- idxKept).take(5)} " +
          s"only-idx=${(idxKept -- liveKept).take(5)}")

      println(f"PROBE indexed_dedup mult=$m ref_docs=$nRef " +
        f"base_docs=$nBase batch=500 kept=${idxKept.size} " +
        f"live_sec=$tLive%.2f build_sec=$tBuild%.2f " +
        f"probe_sec=$tProbe%.2f speedup=${tLive / tProbe}%.1fx")
    }
    spark.stop()
  }
}
