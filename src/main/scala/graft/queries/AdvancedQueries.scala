package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Beyond-parity analytics the survey lists as "free from Spark if
  * exposed" (SURVEY §2.4 note on cube/rollup, §2.3 note on non-equi
  * joins) — exposed here so a reference user gains them on switch.
  */
object AdvancedQueries {

  /** Rollup aggregate (subtotals + grand total). Group keys are
    * COALESCE'd to sentinel labels so null-ordering differences
    * between engines can't affect the compare. */
  val a14 = Q(
    "a14_rollup",
    (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"), col("qty"))
        .orderBy("rf", "ls"),
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                   COALESCE(l_linestatus, 'ALL') AS ls,
                   COUNT(*) AS cnt, ROUND(SUM(l_quantity), 2) AS qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY rf, ls"""))

  /** Multi-quantile summary (exact interpolated quartiles). */
  val a9x = Q(
    "a9x_quantiles",
    (s, d) =>
      Tables.orders(s, d).agg(
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("q25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("q50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("q75")),
    Some("""SELECT ROUND(quantile_cont(o_totalprice, 0.25), 4) AS q25,
                   ROUND(quantile_cont(o_totalprice, 0.5), 4) AS q50,
                   ROUND(quantile_cont(o_totalprice, 0.75), 4) AS q75
            FROM orders"""))

  /** ntile + percent_rank analytic coverage (deciles of order value
    * within status). percent_rank rounded: it divides by (n-1), an
    * exact-in-both-engines double, but rounding keeps the compare
    * safe at the hash level. */
  val w4 = Q(
    "w4_ntile_pctrank",
    (s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(
          col("o_orderstatus"), col("o_orderkey"),
          ntile(10).over(w).cast("long").as("decile"),
          round(percent_rank().over(w), 6).as("pct_rank"))
        .orderBy("o_orderstatus", "o_orderkey")
        .limit(1000)
    },
    Some("""SELECT o_orderstatus, o_orderkey,
                   CAST(NTILE(10) OVER w AS BIGINT) AS decile,
                   ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
            FROM orders
            WINDOW w AS (PARTITION BY o_orderstatus
                         ORDER BY o_totalprice, o_orderkey)
            ORDER BY o_orderstatus, o_orderkey LIMIT 1000"""))

  /** Non-equi (range) join: orders banded into price tiers. The tier
    * table is tiny → broadcast nested-loop, the ONLY sane plan shape
    * for a small-side theta join at scale. */
  val j5 = Q(
    "j5_range_join",
    (s, d) => {
      val spark = s
      import spark.implicits._
      val tiers = Seq(
        ("T1", 0.0, 100000.0),
        ("T2", 100000.0, 250000.0),
        ("T3", 250000.0, 400000.0),
        ("T4", 400000.0, Double.MaxValue))
        .toDF("tier", "lo", "hi")
      Tables.orders(s, d)
        .join(broadcast(tiers),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("tier")
        .agg(count(lit(1)).as("cnt"),
          round(avg(col("o_totalprice")), 2).as("avg_price"))
        .orderBy("tier")
    },
    Some("""SELECT tier, COUNT(*) AS cnt,
                   ROUND(AVG(o_totalprice), 2) AS avg_price
            FROM orders
            JOIN (VALUES ('T1', 0.0, 100000.0),
                         ('T2', 100000.0, 250000.0),
                         ('T3', 250000.0, 400000.0),
                         ('T4', 400000.0, 1e308)) AS t(tier, lo, hi)
              ON o_totalprice >= lo AND o_totalprice < hi
            GROUP BY tier ORDER BY tier"""))

  /** Custom typed Aggregator end-to-end (SURVEY §2.10): registered as
    * a UDAF, invoked through SQL, oracle-checked against the algebraic
    * equivalent. */
  val a15 = Q(
    "a15_custom_aggregator",
    (s, d) => {
      graft.functions.RevenueAgg.register(s)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(expr(
          "revenue_per_unit(l_extendedprice, l_discount, l_quantity)"), 4)
          .as("rev_per_unit"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   ROUND(SUM(l_extendedprice * (1.0 - l_discount)) /
                         SUM(l_quantity), 4) AS rev_per_unit
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Histogram profile: fixed-width value buckets (the numeric twin
    * of A12's categorical value_counts). */
  val a16 = Q(
    "a16_histogram",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(width_bucket(col("o_totalprice"), lit(0.0), lit(600000.0),
          lit(12)).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket"),
    // DuckDB 1.0 has no width_bucket — the closed-form equivalent for
    // in-range positive values (bucket width 600000/12 = 50000)
    Some("""SELECT CAST(FLOOR(o_totalprice / 50000.0) + 1 AS BIGINT) AS bucket,
                   COUNT(*) AS cnt
            FROM orders GROUP BY 1 ORDER BY bucket"""))

  /** Time-of-day/day-of-week activity profile over the event stream —
    * day names (not engine-specific dow numbering) for parity. */
  val f12 = Q(
    "f12_time_profile",
    (s, d) =>
      graft.Tables.events(s, d)
        .groupBy(
          date_format(col("ts"), "EEEE").as("day_name"),
          hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("day_name", "hr"),
    Some("""SELECT dayname(ts) AS day_name,
                   CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
                   COUNT(*) AS cnt
            FROM events GROUP BY 1, 2 ORDER BY day_name, hr"""))

  /** Full CUBE over two dims (rollup's superset: all 4 grouping sets).
    * Same COALESCE-sentinel trick as a14 so null-ordering differences
    * between engines cannot affect the compare. */
  val a14x = Q(
    "a14x_cube",
    (s, d) =>
      Tables.orders(s, d)
        .cube("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice")), 2).as("rev"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          col("cnt"), col("rev"))
        .orderBy("pri", "st"),
    Some("""SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
                   COALESCE(o_orderstatus, 'ALL') AS st,
                   COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS rev
            FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
            ORDER BY pri, st"""))

  /** a18 — grouped exact percentiles (median + p90 per return flag).
    * Exact `percentile` sorts per group inside the aggregate buffer —
    * fine for bounded groups; unbounded-cardinality values per group
    * at 100 TB should switch to `percentile_approx` (t-digest-style
    * sketch, map-side mergeable). */
  val a18 = Q(
    "a18_grouped_percentile",
    (s, d) =>
      graft.Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
                   ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                   ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Array-building aggregation: collect_list/collect_set with a
    * deterministic sort (unordered collects are nondeterministic under
    * parallelism — always sort before comparing or persisting). The
    * sorted arrays are emitted as joined strings so the result is
    * hashable by any downstream comparator — same information, stable
    * encoding.
    * Scale note: per-group array size is bounded by the dim-table
    * cardinality here; collecting an unbounded fact column into one
    * array is the anti-pattern this query deliberately avoids. */
  val a19 = Q(
    "a19_collect_array",
    (s, d) => {
      val nation = graft.Tables.nation(s, d)
      val region = graft.Tables.region(s, d)
      nation.join(broadcast(region),
          nation("n_regionkey") === region("r_regionkey"))
        .groupBy("r_name")
        .agg(
          array_join(sort_array(collect_list(col("n_name"))), ",")
            .as("nations"),
          array_join(
            sort_array(collect_set(col("n_regionkey"))).cast("array<string>"),
            ",").as("region_keys"),
          count(lit(1)).as("n_nations"))
        .orderBy("r_name")
    },
    Some("""SELECT r_name,
                   array_to_string(list_sort(list(n_name)), ',') AS nations,
                   array_to_string(list_sort(list(DISTINCT n_regionkey)), ',')
                     AS region_keys,
                   COUNT(*) AS n_nations
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  /** a20 — exact heavy hitters via Count-Min candidates: users with
    * ≥50 events. The sketch pass is map-side mergeable and the exact
    * GROUP BY runs over candidate keys only — the long tail of light
    * keys never reaches the shuffle. CM never undercounts, so the
    * candidate set is a superset of the true heavies and the final
    * HAVING makes the answer byte-identical to the full GROUP BY the
    * oracle runs. */
  val a20 = Q(
    "a20_heavy_hitters",
    (s, d) =>
      graft.operators.HeavyHitters
        .heavyHitters(Tables.events(s, d), "user_id", minCount = 50L)
        .orderBy("user_id"),
    Some("""SELECT user_id, COUNT(*) AS n_rows
            FROM events GROUP BY user_id HAVING n_rows >= 50
            ORDER BY user_id"""))

  def all: Seq[Q] =
    Seq(a14, a14x, a9x, w4, j5, a15, a16, f12, a18, a19, a20)
}
