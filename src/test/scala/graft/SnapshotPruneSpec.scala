package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.maintain.Snapshots

/** The automatic file-skipping rule over snapshot reads
  * (`spark.graft.snapshotPruning`, [[graft.plans.SnapshotPruneRule]]):
  * an ORDINARY `.filter` over `Snapshots.read` must plan only the
  * files whose per-file manifest stats can overlap — identical rows
  * to the explicit `readVersionWhere` API and to the rule switched
  * off, fewer files planned. */
class SnapshotPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ConfKey = "spark.graft.snapshotPruning"

  private def scanFileCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation
          .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.length
    }.sum

  private def numericTable(): String = {
    val p = TestSpark.tmpDir("snap-prune") + "/t"
    Snapshots.create(
      spark.range(1000).toDF("id").repartitionByRange(4, $"id"),
      p, statsCols = Seq("id"))
    p
  }

  test("a plain filtered Snapshots.read plans only overlapping files") {
    val p = numericTable()
    def q() = Snapshots.read(spark, p)
      .filter($"id" >= 300 && $"id" <= 400)
    val total = Snapshots.read(spark, p).inputFiles.length
    assert(total == 4)
    val expected = q().select("id").as[Long].collect().toSet
    assert(scanFileCount(q()) == total, "flag off → no pruning")
    spark.conf.set(ConfKey, "true")
    try {
      val pruned = q()
      assert(scanFileCount(pruned) < total,
        s"rule did not prune: ${scanFileCount(pruned)} of $total")
      assert(pruned.select("id").as[Long].collect().toSet == expected,
        "pruned result must be bit-identical")
      // …and identical to the explicit readVersionWhere API
      val explicitApi = Snapshots
        .readVersionWhere(spark, p, 1, "id", 300, 400)
        .filter($"id".between(300, 400))
        .select("id").as[Long].collect().toSet
      assert(explicitApi == expected)
      // one-sided bound prunes too
      assert(scanFileCount(Snapshots.read(spark, p)
        .filter($"id" >= 900)) < total)
    } finally spark.conf.set(ConfKey, "false")
  }

  test("date-stat snapshot reads prune on ordinary timestamp predicates") {
    val p = TestSpark.tmpDir("snap-prune-ts") + "/t"
    Snapshots.create(
      spark.range(120).select(
          $"id",
          date_add(lit("2024-01-01").cast("date"),
            $"id".cast("int")).as("d"))
        .repartitionByRange(4, $"d"),
      p, statsCols = Seq("d"))
    val total = Snapshots.read(spark, p).inputFiles.length
    def q() = Snapshots.read(spark, p).filter(
      $"d" >= lit("2024-02-01").cast("date") &&
        $"d" <= lit("2024-02-10").cast("date"))
    val expected = q().select("id").as[Long].collect().toSet
    assert(expected.size == 10)
    spark.conf.set(ConfKey, "true")
    try {
      assert(scanFileCount(q()) < total,
        s"date predicate did not prune: ${scanFileCount(q())} of $total")
      assert(q().select("id").as[Long].collect().toSet == expected)
    } finally spark.conf.set(ConfKey, "false")
  }

  test("TIMESTAMP_NTZ stats prune NTZ predicates through the session zone") {
    val p = TestSpark.tmpDir("snap-prune-ntz") + "/t"
    Snapshots.create(
      spark.range(96).select(
          $"id",
          (lit("2024-01-01 00:00:00").cast("timestamp_ntz") +
            make_dt_interval($"id", lit(0), lit(0), lit(0))).as("t"))
        .repartitionByRange(4, $"t"),
      p, statsCols = Seq("t"))
    val total = Snapshots.read(spark, p).inputFiles.length
    def q() = Snapshots.read(spark, p).filter(
      $"t" >= lit("2024-02-01 00:00:00").cast("timestamp_ntz") &&
        $"t" <= lit("2024-02-10 00:00:00").cast("timestamp_ntz"))
    val expected = q().select("id").as[Long].collect().toSet
    assert(expected.size == 10)
    spark.conf.set(ConfKey, "true")
    try {
      assert(scanFileCount(q()) < total,
        s"NTZ predicate did not prune: ${scanFileCount(q())} of $total")
      assert(q().select("id").as[Long].collect().toSet == expected)
    } finally spark.conf.set(ConfKey, "false")
  }

  test("conservative: stat-less files, foreign columns, non-range predicates") {
    val p = numericTable()
    // an append WITHOUT stats (one file): must survive every prune
    Snapshots.commitAppend(
      spark.range(5000, 5003).toDF("id").repartition(1), p)
    spark.conf.set(ConfKey, "true")
    try {
      val got = Snapshots.read(spark, p)
        .filter($"id" >= 300 && $"id" <= 400)
      // 1 overlapping stats file + 1 stat-less file
      assert(scanFileCount(got) == 2,
        s"stat-less appended file was pruned: ${scanFileCount(got)}")
      // predicate on a column with no stats anywhere → untouched
      val other = Snapshots.read(spark, p)
        .filter(($"id" % 7) === 0)
      assert(scanFileCount(other) == 5)
      // a non-snapshot parquet read never matches the rule
      val dir = TestSpark.tmpDir("plain-parquet")
      spark.range(100).toDF("id").repartitionByRange(4, $"id")
        .write.mode("overwrite").parquet(dir)
      val plain = spark.read.parquet(dir).filter($"id" >= 90)
      assert(scanFileCount(plain) == 4)
    } finally spark.conf.set(ConfKey, "false")
  }

  test("a provably-empty range plans zero files but keeps the schema") {
    val p = numericTable()
    spark.conf.set(ConfKey, "true")
    try {
      val none = Snapshots.read(spark, p).filter($"id" > 10000)
      assert(scanFileCount(none) == 0)
      assert(none.count() == 0)
      assert(none.columns.toSeq == Seq("id"))
    } finally spark.conf.set(ConfKey, "false")
  }
}
