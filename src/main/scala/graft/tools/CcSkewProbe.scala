package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.llm.{Dedup, Sampling}

/** Scale proof for the connected-components family (`dedup_clusters`,
  * `dedup_cluster_keep`, `split_leakage_safe`): plants a 10k-document
  * near-duplicate family (one template + per-doc noise — the "whole
  * site re-crawled through a boilerplate generator" shape) into the
  * sf0.1 corpus and shows that every stage stays bounded:
  *
  *  1. the LSH pass: the family's near-identical signatures collapse
  *     into per-band monster buckets; `capBuckets` drops buckets over
  *     the cap BEFORE the quadratic self-join, so the candidate pass
  *     costs ~the clean-corpus time instead of 32 bands × 10k²/2
  *     pairs. `oversizedBuckets` is printed as the audit of what the
  *     cap declined (the documented trade: a monster family is
  *     exact-dedup's job — its members are near-identical — not the
  *     pair sampler's);
  *  2. label propagation: round count is O(component diameter), not
  *     component size — a planted 10k-node star cluster converges in
  *     2 rounds, and a 1k-node chain (diameter 1000 — the adversarial
  *     worst case no near-dup corpus produces) is TRUNCATED at
  *     maxIters with `converged=false` raised, never an unbounded
  *     loop;
  *  3. the composed operators: `dupClusterStats` and
  *     `leakageSafeSplit` end-to-end wall times on the skewed corpus
  *     vs clean, plus CC iteration counts, so a regression in either
  *     bound shows up as a number, not an anecdote.
  *
  * Run: `sbt "runMain graft.tools.CcSkewProbe [sfDir [famSize]]"`.
  * Output lines are `PROBE <case> k=v ...`; the recorded run lives in
  * SCALE_PROBES.md.
  */
object CcSkewProbe {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val famSize = args.lift(1).map(_.toInt).getOrElse(10000)

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))

    // planted family: one 100-token template + 2 unique tokens per
    // doc → pairwise Jaccard ≈ 0.92 (well above every probe
    // threshold), minhash signatures near-identical → the family's
    // band buckets blow past the cap, which is the point
    val base = (1 to 100).map(i => s"tmpl$i").mkString(" ")
    val family = spark.range(famSize).select(
      (col("id") + 10000000L).as("doc_id"),
      concat(lit(base + " noise"), col("id"),
        lit("a noise"), col("id"), lit("b")).as("text"))
    val skewed = docs.unionByName(family).localCheckpoint(true)
    println(s"PROBE corpus sf=$sfDir n_docs=${docs.count()} " +
      s"fam_size=$famSize n_skewed=${skewed.count()}")

    // 1. cap audit: how many band buckets the default cap drops, and
    // how much of that mass is the planted family
    val (overs, tAudit) = timed {
      Dedup.oversizedBuckets(skewed, numHashes = 64, bands = 32)
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_buckets"),
          coalesce(max(col("n")), lit(0L)).as("max_bucket"))
        .head()
    }
    println(f"PROBE cap_audit oversized_buckets=${overs.getLong(0)} " +
      f"max_bucket=${overs.getLong(1)} sec=$tAudit%.2f")

    // 2. LSH pair pass, clean vs skewed: the skewed pass must cost
    // about the clean pass (capped buckets dropped before the join),
    // never famSize²-ish
    def pairsOf(d: org.apache.spark.sql.DataFrame) =
      Dedup.nearDupPairsMaterialized(d, minJaccard = 0.5,
        numHashes = 64, bands = 32)
    val (pClean, tClean) = timed { val p = pairsOf(docs); (p, p.count()) }
    val (pSkew, tSkew) = timed { val p = pairsOf(skewed); (p, p.count()) }
    println(f"PROBE lsh_pairs clean_pairs=${pClean._2} sec=$tClean%.2f")
    println(f"PROBE lsh_pairs skewed_pairs=${pSkew._2} sec=$tSkew%.2f")

    // 3. label propagation bounds, isolated from LSH:
    //    star = one famSize-doc cluster, diameter 2 → rounds ≈ 2
    val star = spark.range(1, famSize.toLong)
      .select(lit(0L).as("id_a"), col("id").as("id_b"))
    val (starRes, tStar) = timed {
      Dedup.connectedComponentsWithStats(star.toDF(),
        collectThreshold = 0) // probe the distributed rounds, not the fast path
    }
    val starMax = starRes.labels.groupBy("cluster")
      .agg(count(lit(1)).as("sz")).agg(max(col("sz"))).head().getLong(0)
    println(f"PROBE cc_star nodes=$famSize iters=${starRes.iterations} " +
      f"converged=${starRes.converged} max_cluster=$starMax " +
      f"sec=$tStar%.2f sec_per_round=${tStar / starRes.iterations}%.2f")
    //    chain = diameter 1000, the adversarial shape: must TRUNCATE
    //    at maxIters with the signal raised, not loop unbounded
    val chain = spark.range(0, 1000L)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    val (chainRes, tChain) = timed {
      Dedup.connectedComponentsWithStats(chain.toDF(), maxIters = 50,
        collectThreshold = 0)
    }
    println(f"PROBE cc_chain nodes=1001 iters=${chainRes.iterations} " +
      f"converged=${chainRes.converged} sec=$tChain%.2f " +
      f"sec_per_round=${tChain / chainRes.iterations}%.2f")

    // 4. composed operators end-to-end on clean vs skewed corpus
    def stats(d: org.apache.spark.sql.DataFrame) = timed {
      Dedup.dupClusterStats(d, minJaccard = 0.5).head()
    }
    val (sClean, tsClean) = stats(docs)
    val (sSkew, tsSkew) = stats(skewed)
    println(f"PROBE dup_cluster_stats clean " +
      f"n_clusters=${sClean.getLong(1)} max_cluster=${sClean.getLong(3)} " +
      f"sec=$tsClean%.2f")
    println(f"PROBE dup_cluster_stats skewed " +
      f"n_clusters=${sSkew.getLong(1)} max_cluster=${sSkew.getLong(3)} " +
      f"sec=$tsSkew%.2f")
    def split(d: org.apache.spark.sql.DataFrame) = timed {
      Sampling.leakageSafeSplit(d)
        .groupBy("split").agg(count(lit(1)).as("n")).collect()
        .map(r => s"${r.getString(0)}:${r.getLong(1)}").sorted
        .mkString(",")
    }
    val (spClean, tpClean) = split(docs)
    val (spSkew, tpSkew) = split(skewed)
    println(f"PROBE leakage_split clean $spClean sec=$tpClean%.2f")
    println(f"PROBE leakage_split skewed $spSkew sec=$tpSkew%.2f")
    spark.stop()
  }
}
