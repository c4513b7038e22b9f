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

  test("a NaN literal bound never prunes files holding NaN rows (r17 verdict)") {
    val p = TestSpark.tmpDir("snap-prune-nan") + "/t"
    // file 1 carries the NaN rows (plus finite values, so it HAS
    // stats — the writer strips NaN from them); file 2 is all-finite
    Snapshots.create(
      Seq(1.0, Double.NaN, 5.0).toDF("v").repartition(1)
        .union(Seq(100.0, 200.0).toDF("v").repartition(1)),
      p, statsCols = Seq("v"))
    // Spark SQL equality MATCHES NaN (unlike Java doubles): these
    // queries must return the NaN rows with the rule on or off
    def eq() = Snapshots.read(spark, p).filter($"v" === Double.NaN)
    def ge() = Snapshots.read(spark, p).filter($"v" >= Double.NaN)
    assert(eq().count() == 1 && ge().count() == 1)
    spark.conf.set(ConfKey, "true")
    try {
      assert(eq().count() == 1,
        "rule-on NaN equality dropped the NaN row (wrong prune)")
      assert(ge().count() == 1)
      // and a finite probe on the same table still prunes
      assert(scanFileCount(
        Snapshots.read(spark, p).filter($"v" >= 100.0)) == 1)
    } finally spark.conf.set(ConfKey, "false")
  }

  test("string stats prune agency-shaped equality, range, and IN filters") {
    val p = TestSpark.tmpDir("snap-prune-str") + "/t"
    val agencies = Seq("CMS", "DEA", "EPA", "FDA")
    Snapshots.create(
      spark.range(200).select($"id",
          element_at(typedLit(agencies), ($"id" % 4).cast("int") + 1)
            .as("agency"))
        .repartitionByRange(4, $"agency"),
      p, statsCols = Seq("agency"))
    val total = Snapshots.read(spark, p).inputFiles.length
    assert(total == 4)
    def eq() = Snapshots.read(spark, p).filter($"agency" === "EPA")
    def rng() = Snapshots.read(spark, p)
      .filter($"agency" >= "DEA" && $"agency" <= "EPA")
    def in() = Snapshots.read(spark, p)
      .filter($"agency".isin("CMS", "FDA"))
    val (eqExp, rngExp, inExp) = (eq().count(), rng().count(), in().count())
    spark.conf.set(ConfKey, "true")
    try {
      assert(scanFileCount(eq()) < total, "agency equality did not prune")
      assert(eq().count() == eqExp)
      assert(scanFileCount(rng()) < total)
      assert(rng().count() == rngExp)
      assert(scanFileCount(in()) == 2, "string IN-list did not prune")
      assert(in().count() == inExp)
    } finally spark.conf.set(ConfKey, "false")
  }

  test("numeric IN-lists prune per value — both In and the InSet form") {
    val p = numericTable() // 4 range files over 0..999
    // 2 values (stays In) spanning 2 files; 13 values (the optimizer
    // converts to InSet past the 10-element threshold) in 1 file
    def small() = Snapshots.read(spark, p).filter($"id".isin(5L, 910L))
    def large() = Snapshots.read(spark, p)
      .filter($"id".isin((500L to 512L): _*))
    val (sExp, lExp) = (small().count(), large().count())
    spark.conf.set(ConfKey, "true")
    try {
      assert(scanFileCount(small()) == 2,
        s"In did not prune per value: ${scanFileCount(small())}")
      assert(small().count() == sExp)
      assert(scanFileCount(large()) < 4,
        s"InSet did not prune: ${scanFileCount(large())}")
      assert(large().count() == lExp)
    } finally spark.conf.set(ConfKey, "false")
  }

  test("sub-millisecond timestamp bounds stay exact (ADVICE r17: no ms truncation)") {
    val p = TestSpark.tmpDir("snap-prune-us") + "/t"
    // microsecond-precision values: a bound converted through
    // getTime/1000.0 (millisecond floor) lands BELOW the file's
    // stat_min and wrongly prunes the file holding the row
    Snapshots.create(
      spark.range(2).select($"id",
          to_timestamp(lit("2024-01-01 00:00:00.123456")).as("t"))
        .union(spark.range(2).select($"id" + 10,
          to_timestamp(lit("2024-06-01 00:00:00.654321")).as("t")))
        .repartitionByRange(2, $"t"),
      p, statsCols = Seq("t"))
    val total = Snapshots.read(spark, p).inputFiles.length
    def q() = Snapshots.read(spark, p)
      .filter($"t" === to_timestamp(lit("2024-01-01 00:00:00.123456")))
    assert(q().count() == 2)
    spark.conf.set(ConfKey, "true")
    try {
      assert(q().count() == 2,
        "sub-ms equality dropped its rows — bound truncated to millis")
      assert(scanFileCount(q()) < total,
        "the rule did not fire at all (nothing pinned)")
    } finally spark.conf.set(ConfKey, "false")
  }
}
