package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q

/** Event-time windowed aggregations (SURVEY §2.9 extension — the
  * reference simulates increments batch-wise and has no event-time
  * logic; the `events` fixture adds the streaming-native surface).
  *
  * The SAME transformation runs in batch (here, oracle-checked) and on
  * a `readStream` source (Incremental.windowedStream + StreamingSpec):
  * Structured Streaming's contract is exactly that parity, so the
  * batch oracle validates the streaming logic too. Window starts are
  * emitted as formatted strings — precision-stable across parquet
  * ns/us timestamp encodings.
  */
object StreamQueries {

  /** Tumbling 1-hour counts per event type, shared batch/stream. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"),
        col("cnt"))

  val st1 = Q(
    "st_tumbling_hourly",
    (s, d) => hourlyCounts(Tables.events(s, d)).orderBy("hour_start", "event_type"),
    Some("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_start,
                   event_type, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""))

  /** Sliding 1-hour windows every 30 minutes: each event lands in
    * exactly two windows (the 30-min grid and grid − 30 min). */
  val st2 = Q(
    "st_sliding_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("cnt"))
        .orderBy("win_start"),
    Some("""SELECT CAST(ws AS VARCHAR) AS win_start, COUNT(*) AS cnt
            FROM (
              SELECT unnest([grid, grid - INTERVAL 30 MINUTE]) AS ws
              FROM (SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800000000
                     AS BIGINT)) AS grid FROM events))
            GROUP BY ws ORDER BY win_start"""))

  /** Windowed aggregate with a dimension rollup: per-hour per-type sum
    * of values (the shape a streaming sink materializes downstream). */
  val st3 = Q(
    "st_windowed_sum",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
        .agg(round(sum(col("value")), 2).as("total_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"),
          col("total_value"))
        .orderBy("win_start", "event_type"),
    Some("""SELECT CAST(make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600000000
                     AS BIGINT)) AS VARCHAR) AS win_start,
                   event_type, ROUND(SUM(value), 2) AS total_value
            FROM events GROUP BY 1, 2 ORDER BY win_start, event_type"""))

  /** Gap-based sessionization (batch form; the stateful streaming twin
    * is Sessionize.streaming, equivalence-tested in StreamingSpec).
    * Gap arithmetic uses whole seconds in BOTH engines (Spark
    * unix_timestamp floors; the oracle floors epoch()). */
  val st4 = Q(
    "st_sessionize",
    (s, d) => Sessionize.batch(Tables.events(s, d)),
    Some("""SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
                   n_events
            FROM (
              SELECT user_id, session_id, MIN(ts) AS session_start,
                     COUNT(*) AS n_events
              FROM (
                SELECT user_id, ts,
                       SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS session_id
                FROM (
                  SELECT user_id, ts,
                         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                IS NULL
                              OR CAST(floor(epoch(ts)) AS BIGINT) -
                                 CAST(floor(epoch(LAG(ts) OVER (PARTITION BY
                                   user_id ORDER BY ts))) AS BIGINT) > 1800
                              THEN 1 ELSE 0 END AS new_session
                  FROM events))
              GROUP BY user_id, session_id)
            ORDER BY user_id, session_id"""))

  def all: Seq[Q] = Seq(st1, st2, st3, st4)
}
