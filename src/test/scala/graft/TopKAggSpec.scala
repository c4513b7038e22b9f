package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg.collect_top_k

/** Pins the semantics of the `collect_top_k` bounded-heap aggregate
  * (graft.functions.TopKAgg over Catalyst's CollectTopK) that
  * Similarity.knnJoin / hardNegatives build on:
  *  - reverse=false keeps the k LARGEST by struct ordering,
  *    reverse=true the k smallest;
  *  - ties at the boundary resolve by the later struct fields (the
  *    operators make the struct a total order via (-score, id));
  *  - groups smaller than k return all their rows;
  *  - the plan is a partial ObjectHashAggregate — the exchange
  *    carries bounded buffers, not the input rows.
  */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1, 5.0, 10L), (1, 9.0, 11L), (1, 9.0, 12L), (1, 1.0, 13L),
    (2, 3.0, 20L), (2, 7.0, 21L),
    (3, 4.0, 30L)).toDF("g", "score", "id")

  private def topSets(reverse: Boolean): Map[Int, Set[(Double, Long)]] =
    df.groupBy("g")
      .agg(collect_top_k(
        struct(col("score"), (-col("id")).as("nid")), 2, reverse).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.score"), (-col("e.nid")).as("id"))
      .as[(Int, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap

  test("reverse=false keeps the k largest; boundary tie breaks to low id") {
    val got = topSets(reverse = false)
    // group 1: two rows tie at 9.0 — both beat 5.0; tie is interior
    assert(got(1) == Set((9.0, 11L), (9.0, 12L)))
    assert(got(2) == Set((3.0, 20L), (7.0, 21L)))
    // boundary tie: k=1 over the two 9.0 rows must keep the LOWER id
    // (largest (score, -id) struct), matching the operators' window
    // ordering cos DESC, id ASC
    val tie = df.filter(col("g") === 1 && col("score") === 9.0)
      .groupBy("g")
      .agg(collect_top_k(
        struct(col("score"), (-col("id")).as("nid")), 1, reverse = false).as("top"))
      .select(explode(col("top")).as("e"))
      .select((-col("e.nid")).as("id")).as[Long].head()
    assert(tie == 11L)
  }

  test("reverse=true keeps the k smallest") {
    val got = topSets(reverse = true)
    assert(got(1) == Set((1.0, 13L), (5.0, 10L)))
  }

  test("groups under k return every row") {
    assert(topSets(reverse = false)(3) == Set((4.0, 30L)))
  }

  test("plan: partial ObjectHashAggregate feeds the exchange") {
    val p = df.groupBy("g")
      .agg(collect_top_k(struct(col("score")), 2, reverse = false).as("t"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_collect_top_k"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("SQL form resolves via the registered function") {
    df.createOrReplaceTempView("topk_probe")
    val n = spark.sql(
      """SELECT g, collect_top_k(named_struct('s', score), 2, false) AS t
         FROM topk_probe GROUP BY g""").count()
    assert(n == 3L)
  }

  test("SQL form rejects bad arity and non-literal k/reverse cleanly") {
    df.createOrReplaceTempView("topk_probe")
    def analysisError(sql: String): String =
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).queryExecution.analyzed
      }.getMessage
    assert(analysisError(
      "SELECT collect_top_k(score, 2) FROM topk_probe GROUP BY g")
      .contains("3 parameters"))
    // non-literal k: a column reference is not foldable at analysis
    assert(analysisError(
      "SELECT collect_top_k(score, g, false) FROM topk_probe GROUP BY g")
      .contains("foldable"))
    // non-literal reverse
    assert(analysisError(
      "SELECT collect_top_k(score, 2, g > 1) FROM topk_probe GROUP BY g")
      .contains("foldable"))
    // wrong literal type for k
    assert(analysisError(
      "SELECT collect_top_k(score, 'two', false) FROM topk_probe GROUP BY g")
      .contains("foldable"))
  }
}
