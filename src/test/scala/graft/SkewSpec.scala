package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin
import graft.queries.SkewQueries

/** Hot-key fixture (one user owns ~50% of all events — the 0→25k+
  * comments-per-docket skew of the real corpus, exaggerated): the
  * skew-safe twins must not just MATCH their plain twins' results
  * (the oracle gate proves that), they must actually spread the hot
  * key's work across tasks. Pinned here via per-task shuffle-read
  * record counts (deterministic, unlike wall-clock) plus a
  * max-task-duration comparison on the asof pair (the window sort is
  * big enough for timing to be stable).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nRows = 300000L
  private val nUsers = 200

  /** user 0 owns half the rows; ts deterministic, interleaved. */
  private def hotEvents: DataFrame =
    spark.range(nRows).select(
      when($"id" % 2 === 0, 0L).otherwise($"id" % nUsers + 1).as("user"),
      timestamp_micros($"id" * 1000000L + 17).as("ts"),
      ($"id" % 997).cast("double").as("v"))

  /** sparse build side: one state row per user per ~1000 events. */
  private def hotStates: DataFrame =
    spark.range(nRows / 100).select(
      when($"id" % 2 === 0, 0L).otherwise($"id" % nUsers + 1).as("user"),
      timestamp_micros($"id" * 100000000L).as("sts"),
      ($"id" % 31).cast("double").as("state"))

  /** Run `body`, return per-task (shuffleReadRecords, durationMs) for
    * every task the action scheduled. Tests run sequentially in this
    * forked JVM, so the capture window sees only our own tasks. */
  private def taskStats(body: => Unit): Seq[(Long, Long)] = {
    val buf = ArrayBuffer.empty[(Long, Long)]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          buf.synchronized {
            buf += ((t.taskMetrics.shuffleReadMetrics.recordsRead,
              t.taskInfo.duration))
          }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // listener bus is async: wait until the event stream drains
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 100) {
        Thread.sleep(100)
        waited += 1
        val n = buf.synchronized(buf.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    buf.synchronized(buf.toSeq)
  }

  private def maxRecords(s: Seq[(Long, Long)]): Long =
    s.map(_._1).max
  private def maxDurationMs(s: Seq[(Long, Long)]): Long =
    s.map(_._2).max

  test("bucketed asof join spreads the hot key across tasks") {
    // AQE's size-based coalescing would merge ALL these tiny test
    // partitions into one task (they're far below the 64 MB advisory
    // size), hiding the key-distribution effect this test measures —
    // at real volumes partitions exceed the advisory size and stay
    // separate. Disable coalescing so task counts mirror the keys.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val savedCoalesce = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
    val events = hotEvents.localCheckpoint()
    val states = hotStates.localCheckpoint()
    def plain() = AsofJoin.asofJoin(
      events, "user", "ts", states, "user", "sts", Seq("state"))
    def bucketed() = AsofJoin.asofJoinBucketed(
      events, "user", "ts", states, "user", "sts", Seq("state"))(
      // integer division! `/` on Columns is double division, which
      // would make every row its own bucket and degrade the carry
      // pass to a per-key window over all rows (see AsofJoin scaladoc)
      ts => floor(unix_micros(ts) / lit(10000000000L)).cast("long"))

    // the measured action must CONSUME the matched payload — a bare
    // count() lets Catalyst prune the unused window away entirely
    def consume(df: DataFrame): (Long, Double) =
      df.agg(count(lit(1)), sum(coalesce(col("state"), lit(-1.0))))
        .as[(Long, Double)].head()
    // same answer first (checksum, not just count)
    assert(consume(plain()) == consume(bucketed()))

    // warm both plans once so codegen/JIT never lands in the timing
    consume(plain()); consume(bucketed())

    val p = taskStats(consume(plain()))
    val b = taskStats(consume(bucketed()))
    info(s"plain top tasks: ${p.map(_._1).sortBy(-_).take(6).mkString(",")}")
    info(s"bucketed top tasks: ${b.map(_._1).sortBy(-_).take(6).mkString(",")}")
    // plain: ONE window task ingests the hot user's ~150k union rows;
    // bucketed: per-(user, bucket) partitions cap any task well below
    val pMax = maxRecords(p)
    val bMax = maxRecords(b)
    assert(pMax > nRows / 4,
      s"fixture not skewed enough: plain max-task records $pMax")
    // with 8 reducers over a ~318k-row union the balanced floor is
    // ~40k records/task; the bucketed max lands near it (collision
    // imbalance aside) while plain's hot task carries the whole key
    assert(bMax < pMax / 2,
      s"bucketed asof did not spread the hot key: max-task records " +
        s"$bMax vs plain $pMax")
    // NOTE: no wall-clock assertion. Record spread is the deterministic
    // consequence of bucketing and is what the operator guarantees;
    // task *times* on a shared CI box are not — one descheduled task
    // under noisy-neighbor load once measured 631 ms on a 64k-record
    // task while the 166k-record hot task ran 297 ms, failing a
    // duration bound while the record invariant held. Durations stay
    // in the info() lines for humans reading the log.
    info(s"max task ms: plain=${maxDurationMs(p)} bucketed=${maxDurationMs(b)}")
    } finally savedCoalesce match {
      case Some(v) => spark.conf.set(coalesceKey, v)
      case None => spark.conf.unset(coalesceKey)
    }
  }

  test("decomposable agg is already skew-free; salted twin is identical") {
    // The honest measurement behind SkewQueries.saltedAgg's scope
    // note: map-side partial aggregation collapses the hot key to one
    // row per map task BEFORE the shuffle, so the plain group-by's
    // biggest reducer task reads a handful of partial rows — there is
    // no skew for salting to fix on count/sum. Pin that (it's why the
    // a2s twin matches rather than beats), and pin result-identity.
    val events = hotEvents.localCheckpoint()
    def plainAgg() = events.groupBy("user")
      .agg(count(lit(1)).as("cnt"), round(sum($"v"), 2).as("total"))

    plainAgg().collect()
    val p = taskStats(plainAgg().collect())
    val nMapTasks = events.rdd.getNumPartitions
    assert(maxRecords(p) <= nMapTasks.toLong * (nUsers + 1),
      s"partial agg should cap reducer input at maps×keys rows, got " +
        s"${maxRecords(p)}")

    val plainRows = plainAgg().orderBy("user")
      .as[(Long, Long, Double)].collect().toSeq
    val saltedRows = SkewQueries.saltedAgg(events, "user", "v")
      .orderBy("user").as[(Long, Long, Double)].collect().toSeq
    assert(saltedRows == plainRows)
  }
}
