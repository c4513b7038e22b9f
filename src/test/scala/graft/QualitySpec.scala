package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.maintain.Quality

class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dirty = Seq(
    (Some(1L), Some(10.0), Some("ok")),
    (Some(1L), Some(-5.0), Some("ok")),    // dup key + below range
    (None, Some(20.0), Some("bad value")), // null key + regex miss
    (Some(3L), None, None)
  ).toDF("k", "v", "s")

  test("violations are counted per check on a dirty frame") {
    val got = Quality.report(dirty, Seq(
        Quality.notNull("k"),
        Quality.unique("k"),
        Quality.inRange("v", 0.0, 100.0),
        Quality.matches("s", "^ok$")))
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("not_null:k") == (1L, false))
    assert(got("unique:k") == (1L, false))
    assert(got("in_range:v") == (1L, false))
    assert(got("matches:s") == (1L, false))
  }

  test("clean frame passes every check") {
    val clean = Seq((1L, 5.0), (2L, 6.0)).toDF("k", "v")
    val got = Quality.report(clean,
      Seq(Quality.notNull("k"), Quality.unique("k"),
        Quality.nonNegative("v")))
    assert(got.filter(!$"passed").count() == 0)
  }

  test("referential integrity counts orphans, ignores null keys") {
    val ref = Seq(1L, 2L).toDF("id")
    val facts = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val row = Quality.referential(facts, "fk", ref, "id", "ref.id")
      .head()
    assert(row.getString(0) == "ri:fk->ref.id")
    assert(row.getLong(1) == 1L) // only the orphan 99; NULL not counted
    assert(!row.getBoolean(2))
  }

  test("full report unions scalar and RI rows in one frame") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
    val rep = Quality.fullReport(
      orders,
      Seq(Quality.notNull("o_orderkey"), Quality.unique("o_orderkey")),
      ri = Seq(Quality.referential(orders, "o_custkey",
        Tables.customer(spark, TestSpark.sf0001), "c_custkey", "customer")))
      .collect()
    assert(rep.length == 3)
    assert(rep.forall(_.getBoolean(2)), "fixture data should be clean")
  }
}
