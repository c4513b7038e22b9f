package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4 `transformWithState` surface — the successor to
  * `flatMapGroupsWithState` (typed per-key state handles, timers, TTL,
  * RocksDB-backed). Here: a per-user running profile (event count +
  * value total) continuously folded over the stream, the
  * state-accumulator shape behind feature stores and online metrics.
  *
  * Scale: state is partitioned by the grouping key and stored in the
  * per-task RocksDB instance — no driver state, no global shuffle
  * beyond the keyed exchange; TTL (not used here) is how unbounded key
  * spaces stay bounded.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — transformWithState does not
  * run on the default HDFS-backed provider.
  */
object StatefulOps {

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  class UserTotalsProcessor
      extends StatefulProcessor[Long, UserEvent, UserTotals] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)](
        "totals", Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserTotals] = {
      val (n0, s0) =
        if (totals.exists()) totals.get() else (0L, 0.0)
      var n = n0
      var s = s0
      rows.foreach { r => n += 1; s += r.value }
      totals.update((n, s))
      Iterator.single(UserTotals(key, n,
        BigDecimal(s).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
  }

  /** Wire a stream of events into the running-totals processor.
    * Update mode: each batch emits the keys it touched with their new
    * running totals. */
  def userTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new UserTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
