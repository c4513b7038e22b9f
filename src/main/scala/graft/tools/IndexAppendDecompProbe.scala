package graft.tools

import org.apache.spark.sql.functions._

/** Decompose the `st_*_index_append` family's per-run cost into its
  * three phases — base-index COPY (driver file I/O), APPEND (segment
  * writes), PROBE (the indexed query) — plus the base-index file
  * count, which drives all three (guide §1: measure first; §6: small
  * files hurt twice). Run before/after the shard-sizing change.
  *
  * Usage: runMain graft.tools.IndexAppendDecompProbe <sfDir>
  * Prints one line per family: name, nFilesBase, copy s, append s,
  * probe s (each min of 3 passes after one untimed warmup).
  */
object IndexAppendDecompProbe {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    val tag = java.lang.Integer.toHexString(sfDir.hashCode)
    val conf = spark.sparkContext.hadoopConfiguration
    import graft.{Tables => T}
    // mirror the bench suite's small-input tuning so phase times are
    // comparable to the suite's per-query seconds
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4194304")
    val docs = T.documents(spark, sfDir).cache()
    val embs = T.embeddings(spark, sfDir).cache()
    docs.count(); embs.count()

    def countFiles(p: String): Int = {
      val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(conf)
      def walk(d: org.apache.hadoop.fs.Path): Int =
        fs.listStatus(d).map(st =>
          if (st.isDirectory) walk(st.getPath) else 1).sum
      walk(new org.apache.hadoop.fs.Path(p))
    }
    def copyTo(base: String): String = {
      val dst = java.nio.file.Files
        .createTempDirectory("probe_idx").toString + "/idx"
      val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(conf)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(base),
        fs, new org.apache.hadoop.fs.Path(dst), false, true, conf)
      dst
    }

    def phase(name: String, base: String, build: () => Unit,
        append: String => Unit, probe: String => Unit): Unit = {
      build()
      val n = countFiles(base)
      var copyS, appS, prS = Double.MaxValue
      // one untimed warmup then 3 timed passes, min per phase
      (0 to 3).foreach { i =>
        var dst: String = null
        val c = time { dst = copyTo(base) }
        val a = time { append(dst) }
        val p = time { probe(dst) }
        if (i > 0) {
          copyS = math.min(copyS, c); appS = math.min(appS, a)
          prS = math.min(prS, p)
        }
      }
      println(f"[idxdecomp] $name%-10s files=$n%4d copy=$copyS%7.3f " +
        f"append=$appS%7.3f probe=$prS%7.3f")
    }

    phase("bm25",
      s"target/bm25_append_base_$tag",
      () => {
        if (!graft.llm.Retrieval.bm25IndexExists(
            spark, s"target/bm25_append_base_$tag"))
          graft.llm.Retrieval.writeBm25Index(
            docs.filter(col("doc_id") % 2 === 0),
            s"target/bm25_append_base_$tag")
      },
      dst => graft.llm.Retrieval.appendToBm25Index(
        docs.filter(col("doc_id") % 2 === 1), dst),
      dst => graft.llm.Retrieval.bm25TopKIndexed(
        spark, dst, Seq("hash", "merge", "scan"), k = 15).count())

    phase("dense",
      s"target/dense_append_base_$tag",
      () => {
        if (!graft.llm.Retrieval.denseIndexExists(
            spark, s"target/dense_append_base_$tag"))
          graft.llm.Retrieval.writeDenseIndex(
            docs.filter(col("doc_id") % 2 === 0),
            s"target/dense_append_base_$tag")
      },
      dst => graft.llm.Retrieval.appendToDenseIndex(
        docs.filter(col("doc_id") % 2 === 1), dst),
      dst => {
        val bm25Path = s"target/bm25_index_$tag"
        if (!graft.llm.Retrieval.bm25IndexExists(spark, bm25Path))
          graft.llm.Retrieval.writeBm25Index(docs, bm25Path)
        import spark.implicits._
        val qs = Seq((0, "hash join merge"), (1, "filter scan index"))
          .toDF("query_id", "query_text")
        graft.llm.Retrieval.hybridTopKFullyIndexed(
          spark, bm25Path, dst, qs, k = 10, nPerSide = 20).count()
      })

    phase("lsh",
      s"target/lsh_append_base_$tag",
      () => {
        if (!graft.llm.Dedup.lshIndexExists(
            spark, s"target/lsh_append_base_$tag"))
          graft.llm.Dedup.writeLshIndex(
            docs.filter(col("doc_id") % 4 === 0),
            s"target/lsh_append_base_$tag")
      },
      dst => graft.llm.Dedup.appendToLshIndex(
        docs.filter(col("doc_id") % 4 === 2), dst),
      dst => {
        val planted = docs.filter(col("doc_id") % 2 === 0)
          .filter(col("doc_id") < 20)
          .withColumn("doc_id", col("doc_id") + 1000000L)
        val incoming = docs.filter(col("doc_id") % 2 === 1)
          .unionByName(planted)
        graft.llm.Dedup
          .incrementalDedupIndexedWithAudit(incoming, dst)._2.count()
      })

    phase("pq",
      s"target/pq_append_base_$tag",
      () => {
        if (!graft.llm.Quantize.pqIndexExists(
            spark, s"target/pq_append_base_$tag"))
          graft.llm.Quantize.writePqIndex(
            embs.filter(col("vec_id") % 2 === 0),
            s"target/pq_append_base_$tag",
            nlist = 4, iters = 2, m = 8, k = 16)
      },
      dst => graft.llm.Quantize.appendToPqIndex(
        embs.filter(col("vec_id") % 2 === 1), dst),
      dst => {
        val qv = embs.filter(col("vec_id") === 7)
          .select(col("embedding")).collect().headOption
          .map(_.getSeq[Float](0).map(_.toDouble).toArray)
          .getOrElse(Array.fill(64)(0.0))
        graft.llm.Quantize.ivfPqTopKIndexed(
          spark, dst, qv, topK = 10, nprobe = 2, excludeId = 7L).count()
      })

    spark.stop()
  }
}
