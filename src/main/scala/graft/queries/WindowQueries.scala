package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window functions (SURVEY §2.5). The reference has none — its top-k
  * never partitions — so these are the natural extensions the survey
  * calls out: top-k WITHIN group via row_number, and a running
  * (cumulative) aggregate.
  *
  * Scale design: a window partitioned by a real key (c_mktsegment,
  * user_id) shuffles once on that key and then runs sorted within each
  * partition — the shuffle is inherent to the semantics. Never use an
  * empty `Window.partitionBy()` at scale: it funnels the whole table
  * through ONE task.
  */
object WindowQueries {

  /** w1 — top-3 orders per market segment (top-k within group).
    *
    * Plan: bounded `collect_top_k` heap per segment, not a window
    * rank. With ~5 segments a `Window.partitionBy(c_mktsegment)`
    * funnels the whole fact table into 5 reducer partitions and sorts
    * each in full (even `WindowGroupLimit`'s partial mode sorts every
    * map partition before its limit) — at 100 TB that is 5 tasks
    * sorting 20 TB each. The heap aggregate keeps one 3-row heap per
    * (segment, map task) and ships ≤3 rows per segment per task
    * through the exchange; the struct ordering (-price, orderkey) is
    * a total order equal to price DESC, orderkey ASC, so the kept set
    * equals the window-rank answer row for row (pinned against
    * [[w1WindowPlan]] in QueriesSpec). */
  val w1 = Q(
    "w1_topk_per_group",
    (s, d) => {
      val joined = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
      joined
        .groupBy("c_mktsegment")
        .agg(graft.functions.TopKAgg.collect_top_k(
          struct(
            (-col("o_totalprice")).as("neg_price"),
            col("o_orderkey").as("okey")),
          3, reverse = true).as("top"))
        .select(col("c_mktsegment"), explode(col("top")).as("e"))
        .select(
          col("c_mktsegment"),
          col("e.okey").as("o_orderkey"),
          (-col("e.neg_price")).as("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("o_totalprice").desc, col("o_orderkey"))
    },
    Some("""SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
              SELECT c_mktsegment, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders JOIN customer ON o_custkey = c_custkey)
            WHERE rn <= 3
            ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey"""))

  /** The window-rank formulation of [[w1]] — the plan a window
    * `row_number` gives (kept as the semantic reference: QueriesSpec
    * pins the heap plan frame-equal to this one). Not the headline
    * plan; see the w1 scaladoc for why the heap wins at scale. */
  def w1WindowPlan(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val joined = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")
      .orderBy(col("c_mktsegment"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** w2 — running per-user cumulative sum over event order. */
  val w2 = Q(
    "w2_running_sum",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(
          col("user_id"), col("event_id"),
          round(sum(col("value")).over(w), 2).as("running_val"))
        .orderBy("user_id", "event_id")
        .limit(500)
    },
    Some("""SELECT user_id, event_id,
                   ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS UNBOUNDED PRECEDING), 2) AS running_val
            FROM events ORDER BY user_id, event_id LIMIT 500"""))

  /** w3 — rank + lag: per-segment price rank and gap to previous order
    * value (analytic function coverage). */
  val w3 = Q(
    "w3_rank_lag",
    (s, d) => {
      val joined = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      joined
        .withColumn("price_rank", rank().over(w).cast("long"))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .filter(col("price_rank") <= 5)
        .orderBy(col("c_mktsegment"), col("price_rank"))
    },
    Some("""SELECT * FROM (
              SELECT c_mktsegment, o_orderkey, o_totalprice,
                     CAST(RANK() OVER w AS BIGINT) AS price_rank,
                     LAG(o_totalprice, 1) OVER w AS prev_price
              FROM orders JOIN customer ON o_custkey = c_custkey
              WINDOW w AS (PARTITION BY c_mktsegment
                           ORDER BY o_totalprice DESC, o_orderkey))
            WHERE price_rank <= 5
            ORDER BY c_mktsegment, price_rank"""))

  /** w6 — first/last/second event value per user over the full
    * partition frame (session entry/exit/bounce analysis). Ordering
    * carries event_id as tiebreak so equal timestamps stay
    * deterministic across engines; one shuffle on user_id. */
  val w6 = Q(
    "w6_first_last",
    (s, d) => {
      val full = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val rn = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .filter(col("user_id") < 200)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("first_val", round(first(col("value")).over(full), 4))
        .withColumn("last_val", round(last(col("value")).over(full), 4))
        .withColumn("second_val",
          round(nth_value(col("value"), 2).over(full), 4))
        .withColumn("rn", row_number().over(rn))
        .filter(col("rn") === 1)
        .select("user_id", "first_val", "last_val", "second_val")
        .orderBy("user_id")
    },
    Some("""SELECT user_id, first_val, last_val, second_val FROM (
              SELECT user_id,
                     ROUND(first_value(value) OVER w, 4) AS first_val,
                     ROUND(last_value(value) OVER w, 4) AS last_val,
                     ROUND(nth_value(value, 2) OVER w, 4) AS second_val,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn
              FROM events WHERE user_id < 200
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING))
            WHERE rn = 1 ORDER BY user_id"""))

  def all: Seq[Q] = Seq(w1, w2, w3, w6)
}
