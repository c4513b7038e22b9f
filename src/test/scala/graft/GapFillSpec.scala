package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GapFill

/** Gap-fill semantics: grid alignment, forward-fill across gaps,
  * per-key independence. */
class GapFillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourly grid is step-aligned and forward-fills across gaps") {
    val obs = Seq(
      ("u1", ts("2025-01-01 00:10:00"), 1.0),
      ("u1", ts("2025-01-01 03:50:00"), 2.0), // 3-hour gap to fill
      ("u2", ts("2025-01-01 01:30:00"), 9.0))
      .toDF("k", "t", "v")
    val out = GapFill.forwardFill(obs, "k", "t", "v", 3600L)
      .orderBy("k", "grid_ts")
      .as[(String, Timestamp, Option[Double])].collect().toSeq
    assert(out == Seq(
      // u1 grid: 00:00 (floor of 00:10) .. 04:00 (ceil of 03:50).
      // 00:00 precedes the first observation → NULL; the gap
      // forward-fills; 04:00 carries the final state.
      ("u1", ts("2025-01-01 00:00:00"), None),
      ("u1", ts("2025-01-01 01:00:00"), Some(1.0)),
      ("u1", ts("2025-01-01 02:00:00"), Some(1.0)),
      ("u1", ts("2025-01-01 03:00:00"), Some(1.0)),
      ("u1", ts("2025-01-01 04:00:00"), Some(2.0)),
      // u2: single obs at 01:30 → grid 01:00 (NULL) and 02:00 (state)
      ("u2", ts("2025-01-01 01:00:00"), None),
      ("u2", ts("2025-01-01 02:00:00"), Some(9.0))))
  }

  test("an exactly-aligned single observation yields a one-point grid") {
    val obs = Seq(("u", ts("2025-01-01 05:00:00"), 3.0)).toDF("k", "t", "v")
    val out = GapFill.forwardFill(obs, "k", "t", "v", 3600L)
      .as[(String, Timestamp, Option[Double])].collect().toSeq
    assert(out == Seq(("u", ts("2025-01-01 05:00:00"), Some(3.0))))
  }
}
