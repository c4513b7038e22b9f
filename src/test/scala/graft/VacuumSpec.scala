package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.maintain.Vacuum

/** Warehouse-root sweep of swap leftovers: orphan tmp dirs removed,
  * mid-swap backups restored as their table, stale backups cleared,
  * healthy tables untouched. */
class VacuumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vacuum heals every crash residue class in one sweep") {
    val root = TestSpark.tmpDir("vacuum")
    def write(name: String, tag: String): Unit =
      Seq((1L, tag)).toDF("id", "v").write.parquet(s"$root/$name")

    write("t1", "live")
    write("t1_precompact", "stale") // crash after swap, before delete
    write("t2_preupsert", "orig")   // crash between renames: no t2
    write("t3", "live")
    write("t3_compacting", "half")  // orphan half-written replacement
    write("t4", "untouched")
    // a REAL table that merely looks like a tmp dir (no t5 base, no
    // t5_preupsert backup) — must never be swept
    write("t5_upserting", "user-data")

    val report = Vacuum.vacuum(spark, root)

    assert(report.removedTmp.map(p => p.split('/').last) == Seq("t3_compacting"))
    assert(report.recoveredTables.map(_.split('/').last) == Seq("t2"))
    assert(report.clearedBackups.map(_.split('/').last) == Seq("t1_precompact"))

    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val left = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).sorted.toSeq
    assert(left == Seq("t1", "t2", "t3", "t4", "t5_upserting"))
    assert(spark.read.parquet(s"$root/t5_upserting").select("v")
      .as[String].head() == "user-data")
    // t1 kept the LIVE copy, t2 recovered the original rows
    assert(spark.read.parquet(s"$root/t1").select("v")
      .as[String].head() == "live")
    assert(spark.read.parquet(s"$root/t2").select("v")
      .as[String].head() == "orig")
  }

  test("a dir named exactly a bare suffix does not derail the sweep") {
    val root = TestSpark.tmpDir("vacuum_bare")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root/_precompact")
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$root/t")
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$root/t_compacting")
    val report = Vacuum.vacuum(spark, root)
    // the orphan tmp (plausible: base `t` exists) is still cleaned;
    // the bare-suffix dirs are ignored
    assert(report.removedTmp.map(_.split('/').last) == Seq("t_compacting"))
    assert(report.recoveredTables.isEmpty && report.clearedBackups.isEmpty)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/_precompact")))
  }

  test("tmp dir whose base is only present as a backup is still swept") {
    // crash mid-replace: base renamed away to the backup, tmp not yet
    // renamed in — tmp must be recognized via the backup's presence
    val root = TestSpark.tmpDir("vacuum_midswap")
    Seq((1L, "orig")).toDF("id", "v").write.parquet(s"$root/t_prezorder")
    Seq((1L, "half")).toDF("id", "v").write.parquet(s"$root/t_zordering")
    val report = Vacuum.vacuum(spark, root)
    assert(report.removedTmp.map(_.split('/').last) == Seq("t_zordering"))
    assert(report.recoveredTables.map(_.split('/').last) == Seq("t"))
    assert(spark.read.parquet(s"$root/t").select("v")
      .as[String].head() == "orig")
  }

  test("divergent twin backups: one restored, the other left for review") {
    val root = TestSpark.tmpDir("vacuum_twins")
    Seq((1L, "compact-copy")).toDF("id", "v")
      .write.parquet(s"$root/t_precompact")
    Seq((1L, "upsert-copy")).toDF("id", "v")
      .write.parquet(s"$root/t_preupsert")
    val report = Vacuum.vacuum(spark, root)
    assert(report.recoveredTables.map(_.split('/').last) == Seq("t"))
    assert(report.clearedBackups.isEmpty,
      "the losing divergent copy must NOT be silently deleted")
    // suffix order is deterministic: _precompact wins
    assert(spark.read.parquet(s"$root/t").select("v")
      .as[String].head() == "compact-copy")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/t_preupsert")),
      "diverging backup left in place")
  }

  test("vacuum on a clean root is a no-op") {
    val root = TestSpark.tmpDir("vacuum_clean")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root/t")
    val report = Vacuum.vacuum(spark, root)
    assert(report.removedTmp.isEmpty && report.recoveredTables.isEmpty &&
      report.clearedBackups.isEmpty)
  }
}
