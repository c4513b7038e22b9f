package graft.streaming

import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.maintain.Snapshots

/** `maxVersionsPerBatch` rate limiting on the snapshot sources,
  * exercised against the v1 `Source` contract directly (a simulated
  * engine loop — getOffset/getBatch/commit — because
  * Trigger.AvailableNow's wrapper latches the end offset at query
  * start and so cannot observe per-trigger capping): a cold consumer
  * catching up on a long commit history must advance at most N
  * versions per micro-batch, never regress past a committed offset
  * on restart, and serve every row exactly once across the capped
  * batches. */
class SnapshotSourceRateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def table(tag: String): String = {
    val dir = TestSpark.tmpDir(s"rate-$tag") + "/t"
    Snapshots.create(spark.range(10).toDF("id"), dir)
    for (i <- 1 to 4)
      Snapshots.commitAppend(
        spark.range(i * 100, i * 100 + 10).toDF("id"), dir)
    dir // versions 1..5, 10 rows each
  }

  /** One engine step: poll, serve, commit. Returns the new committed
    * offset. The served frame is streaming-tagged (row actions belong
    * to the real engine), so the assertions ride on the OFFSETS —
    * which fully determine the served version ranges. */
  private def step(src: SnapshotSource,
      committed: Option[OffsetV1]): Option[OffsetV1] =
    src.getOffset.filter(o => !committed.map(_.json).contains(o.json))
      .map { end =>
        src.getBatch(committed, end)
        src.commit(end)
        end
      }

  test("capped catch-up advances at most N versions per batch to the head") {
    val t = table("cap")
    val meta = TestSpark.tmpDir("rate-cap-meta")
    val src = new SnapshotSource(spark, t,
      Snapshots.read(spark, t).schema, 0L, false, meta, 2)
    var committed: Option[OffsetV1] = None
    val offsets = Seq.newBuilder[Long]
    var go = true
    while (go) step(src, committed) match {
      case Some(end) =>
        offsets += end.json.toLong; committed = Some(end)
      case None => go = false
    }
    // 5 versions at cap 2 → offsets 2, 4, 5: three batches, each
    // advancing ≤ 2, ending at the head
    assert(offsets.result() == Seq(2L, 4L, 5L))
  }

  test("restart resumes from the persisted high-water mark, no regression") {
    val t = table("restart")
    val meta = TestSpark.tmpDir("rate-restart-meta")
    def fresh() = new SnapshotSource(spark, t,
      Snapshots.read(spark, t).schema, 0L, false, meta, 2)
    val src1 = fresh()
    val o1 = step(src1, None).get
    assert(o1.json.toLong == 2L)
    // a NEW instance (restart) with no engine replay call: its first
    // offer resumes from the durable mark — at or past the committed
    // offset (2), never below it
    val src2 = fresh()
    assert(src2.getOffset.map(_.json.toLong).contains(4L))
    // the mark persists BEFORE an offer is served, so src2's offer of
    // 4 is already durable: yet another instance continues PAST it
    // (4+2 capped to head 5) — offers only ever move forward, which
    // is exactly what makes a backward/duplicate batch impossible
    val src3 = fresh()
    src3.getBatch(None, o1) // v1 recovery contract: observes, no regress
    assert(src3.getOffset.map(_.json.toLong).contains(5L))
    // an unparsable mark (crash mid-write) degrades to an UNCAPPED
    // offer — head is always ≥ committed, so still never backward
    val fsP = new org.apache.hadoop.fs.Path(s"$meta/high-water")
    val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(fsP, true)
    out.write("garbage".getBytes); out.close()
    assert(fresh().getOffset.map(_.json.toLong).contains(5L))
  }

  test("uncapped source behavior is unchanged; CDF source honors the cap too") {
    val t = table("uncapped")
    val meta = TestSpark.tmpDir("rate-un-meta")
    val un = new SnapshotSource(spark, t,
      Snapshots.read(spark, t).schema, 0L, false, meta, 0)
    assert(un.getOffset.map(_.json.toLong).contains(5L))
    val cdfMeta = TestSpark.tmpDir("rate-cdf-meta")
    val cdf = new SnapshotCdfSource(spark, t,
      Snapshots.read(spark, t).schema, 0L, Seq.empty, cdfMeta, 3)
    var committed: Option[OffsetV1] = None
    val offsets = Seq.newBuilder[Long]
    var go = true
    while (go) cdf.getOffset
      .filter(o => !committed.map(_.json).contains(o.json)) match {
      case Some(end) =>
        cdf.getBatch(committed, end)
        cdf.commit(end)
        offsets += end.json.toLong; committed = Some(end)
      case None => go = false
    }
    assert(offsets.result() == Seq(3L, 5L))
  }
}
