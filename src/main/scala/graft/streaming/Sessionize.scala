package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical custom-state operator the
  * brief's streaming surface calls for.
  *
  * Two implementations with identical semantics:
  *  - `batch`: window functions (LAG gap → session-start flags →
  *    running sum = session id). One shuffle on user_id; SQL-oracle-able.
  *  - `streaming`: `flatMapGroupsWithState` with per-user state
  *    (open-session aggregate) and a processing-time timeout — the
  *    shape a true unbounded stream needs, where the window-function
  *    form is impossible (it would require the whole history).
  */
object Sessionize {

  /** Batch sessionization: session breaks at gaps > gapSeconds.
    * Output: one row per (user_id, session) with bounds and count. */
  def batch(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))
            > gapSeconds, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id")
  }

  final case class Event(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(
      user_id: Long, session_start: String, n_events: Long)

  /** Streaming sessionization: per-user open-session state, emitted
    * when the gap closes it (or on timeout). Event-time ordering
    * within a micro-batch is handled by sorting the group's batch.
    *
    * `timeout`: NoTimeout (default) closes sessions only when a later
    * out-of-gap event arrives — drain-friendly (Trigger.AvailableNow
    * can terminate). Production low-latency streams should pass
    * ProcessingTimeTimeout so idle sessions flush without waiting for
    * the user's next event — note that keeps the query scheduling
    * timeout micro-batches indefinitely (by design for an unbounded
    * stream). */
  def streaming(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val useTimeout = timeout != GroupStateTimeout.NoTimeout

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeout) {
        (userId: Long, batch: Iterator[Event],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, fmt.format(new java.util.Date(s.start)), s.n))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += Session(userId,
                    fmt.format(new java.util.Date(s.start)), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach(state.update)
            if (useTimeout) state.setTimeoutDuration(gapSeconds * 1000 * 2)
            closed.result().iterator
          }
      }
  }
}
