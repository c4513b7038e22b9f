package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.maintain.Upsert

/** MERGE-like upsert: update/insert/keep semantics, deterministic
  * tie-breaks, schema drift, and the crash-safe path-level swap. */
class UpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("id", "v", "ver")

  test("update, insert, and keep in one merge") {
    val updates = Seq((2L, "B", 2L), (4L, "d", 1L)).toDF("id", "v", "ver")
    val out = Upsert.mergeFrames(target, updates, Seq("id"), "ver", "ver")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 1L), (2L, "B", 2L), (3L, "c", 1L),
      (4L, "d", 1L)))
  }

  test("ties resolve by the tiebreak arg-max, deterministically") {
    val updates = Seq((1L, "x", 1L), (1L, "y", 1L)).toDF("id", "v", "ver")
    val withTb = updates.withColumn("tb", when($"v" === "y", 9L).otherwise(0L))
    val out = Upsert.mergeFrames(
        target.withColumn("tb", lit(5L)), withTb, Seq("id"), "ver", "tb")
      .filter($"id" === 1).select("v").as[String].collect().toSeq
    assert(out == Seq("y"), s"max tiebreak must win: $out")
  }

  test("schema drift: update columns absent from target become NULL rows") {
    val updates = Seq((5L, 2L, "extra")).toDF("id", "ver", "note")
    val out = Upsert.mergeFrames(target, updates, Seq("id"), "ver", "ver")
    assert(out.columns.toSet == Set("id", "v", "ver", "note"))
    val r5 = out.filter($"id" === 5).select("v", "note")
      .as[(Option[String], Option[String])].collect().head
    assert(r5 == (None, Some("extra")))
  }

  test("random equivalence with a brute-force reference") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 4) {
      // small domains force key overlap and (key, version) ties
      val tRows = Seq.tabulate(40)(i =>
        (rnd.nextInt(15).toLong, s"t$i", rnd.nextInt(5).toLong, i.toLong))
      val uRows = Seq.tabulate(30)(i =>
        (rnd.nextInt(15).toLong, s"u$i", rnd.nextInt(5).toLong,
          (100 + i).toLong))
      val out = Upsert.mergeFrames(
          tRows.toDF("id", "v", "ver", "tb"),
          uRows.toDF("id", "v", "ver", "tb"),
          Seq("id"), "ver", "tb")
        .select("id", "v").as[(Long, String)].collect().toMap
      val expect = (tRows ++ uRows).groupBy(_._1).map { case (k, rows) =>
        val best = rows.maxBy(r => (r._3, r._4))
        k -> best._2
      }
      assert(out == expect, s"merge diverged in round $round")
    }
  }

  test("path-level upsert swaps atomically and survives re-read") {
    val dir = TestSpark.tmpDir("upsert") + "/t"
    target.write.parquet(dir)
    val updates = Seq((3L, "C", 7L), (9L, "i", 1L)).toDF("id", "v", "ver")
    val (before, after) =
      Upsert.upsertPath(spark, dir, updates, Seq("id"), "ver", "ver")
    assert(before == 3 && after == 4)
    val back = spark.read.parquet(dir).orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    assert(back == Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "C", 7L),
      (9L, "i", 1L)))
  }

  private def hadoopFs(path: String) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  test("crash between swap renames: next upsert restores the backup") {
    val dir = TestSpark.tmpDir("upsert_crash1") + "/t"
    target.write.parquet(dir)
    // simulate a crash after rename(path -> backup): table gone,
    // backup holds the real data
    val fs = hadoopFs(dir)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      Upsert.backupPath(dir)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    val updates = Seq((2L, "B", 9L)).toDF("id", "v", "ver")
    val (before, after) =
      Upsert.upsertPath(spark, dir, updates, Seq("id"), "ver", "ver")
    assert(before == 3 && after == 3, "recover must see all prior rows")
    assert(!fs.exists(Upsert.backupPath(dir)), "backup cleaned up")
    val back = spark.read.parquet(dir).orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    assert(back == Seq((1L, "a", 1L), (2L, "B", 9L), (3L, "c", 1L)))
  }

  test("crash before backup delete: stale backup is cleared, not merged") {
    val dir = TestSpark.tmpDir("upsert_crash2") + "/t"
    target.write.parquet(dir)
    // simulate a crash after the swap completed but before the backup
    // delete: live table at dir, stale older copy at the backup path
    Seq((1L, "STALE", 0L)).toDF("id", "v", "ver")
      .write.parquet(Upsert.backupPath(dir).toString)
    val updates = Seq((9L, "i", 1L)).toDF("id", "v", "ver")
    val (before, after) =
      Upsert.upsertPath(spark, dir, updates, Seq("id"), "ver", "ver")
    assert(before == 3 && after == 4)
    assert(!hadoopFs(dir).exists(Upsert.backupPath(dir)))
    val v1 = spark.read.parquet(dir).filter($"id" === 1L)
      .select("v").as[String].collect().toSeq
    assert(v1 == Seq("a"), "stale backup content must not resurface")
  }

  test("streaming upsert recovers a table half-created by a crashed batch") {
    import graft.streaming.Incremental
    val root = TestSpark.tmpDir("upsert_stream_halfcreate")
    val (src, dest, ckpt) = (s"$root/src", s"$root/dest", s"$root/ckpt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    // simulate a crash during the very first table write: destDir
    // exists but holds only uncommitted debris, zero data files
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dest/_temporary/0"))
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ver")
      .coalesce(1).write.json(s"$src/b1")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, v STRING, ver LONG")
    Incremental.upsertStream(
      spark.readStream.schema(schema).json(s"$src/*"),
      dest, ckpt, Seq("id"), "ver", "ver").awaitTermination()
    val back = spark.read.parquet(dest).orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    assert(back == Seq((1L, "a", 1L), (2L, "b", 1L)),
      s"half-created dir must be cleared and recreated: $back")
  }

  test("streaming upsert does not mistake a mid-swap crash for batch one") {
    import graft.streaming.Incremental
    val root = TestSpark.tmpDir("upsert_stream_crash")
    val (src, dest, ckpt) = (s"$root/src", s"$root/dest", s"$root/ckpt")
    val fs = hadoopFs(dest)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    // batch 1 creates the table
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ver")
      .coalesce(1).write.json(s"$src/b1")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, v STRING, ver LONG")
    def drain(): Unit = Incremental.upsertStream(
      spark.readStream.schema(schema).json(s"$src/*"),
      dest, ckpt, Seq("id"), "ver", "ver").awaitTermination()
    drain()
    assert(spark.read.parquet(dest).count() == 2)
    // simulate a crash mid-swap: table only at the backup path
    assert(fs.rename(new org.apache.hadoop.fs.Path(dest),
      Upsert.backupPath(dest)))
    // batch 2 arrives; without recovery it would recreate the table
    // from this single batch and silently drop ids 1 and 2
    Seq((3L, "c", 1L)).toDF("id", "v", "ver")
      .coalesce(1).write.json(s"$src/b2")
    drain()
    val back = spark.read.parquet(dest).orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    assert(back == Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)),
      s"mid-swap crash must not shadow prior rows: $back")
  }
}
