package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's core analytics workload re-expressed Spark-first.
  *
  * Sources (reference, read-only): the 8-query DuckDB suite at
  * `demo_optimized_data.py:92-119` and the 6-query suite at
  * `simple_iceberg_exploration.py:321-328`, plus the pandas analytics at
  * `demo_optimized_data.py:48-80`. Operator IDs (a1..a12, o1..o2, f*,
  * p4/p6/p7) follow SURVEY.md §2.
  *
  * Scale notes (100 TB design):
  *  - every aggregate here is a partial+final hash aggregate (map-side
  *    combine) — no driver-side loops, no collect;
  *  - top-k (`orderBy.limit`) plans as TakeOrderedAndProject — a per-
  *    partition bounded heap + driver merge of k rows, never a full sort;
  *  - filters/projections are plain Column algebra so they reach the
  *    parquet scan as PushedFilters/ReadSchema (verified in BenchAudit);
  *  - all temporal outputs are formatted strings or DATE so the oracle
  *    compare is precision-stable (parquet ns vs us timestamps).
  */
object CoreQueries {

  /** a1 — global count. Ref: demo_optimized_data.py:93,
    * simple_iceberg_exploration.py:322. */
  val a1 = Q(
    "a1_count",
    (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("cnt")),
    Some("SELECT COUNT(*) AS cnt FROM lineitem"))

  /** a2 — group-by count (agencyId analog → l_returnflag).
    * Ref: demo_optimized_data.py:94, simple_iceberg_exploration.py:323. */
  val a2 = Q(
    "a2_groupby_count",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, COUNT(*) AS cnt
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** a3/p7 — filtered count with a complex null-aware conjunction.
    * Ref: demo_optimized_data.py:113-118 (has_attachments AND NOT
    * withdrawn AND LENGTH(comment) > 1000). */
  val a3 = Q(
    "a3_filtered_count",
    (s, d) =>
      Tables.orders(s, d)
        .filter(
          col("o_orderstatus") === "F" &&
            col("o_totalprice") > 150000.0 &&
            col("o_orderpriority") =!= "5-LOW" &&
            col("o_orderdate").isNotNull)
        .agg(count(lit(1)).as("cnt")),
    Some("""SELECT COUNT(*) AS cnt FROM orders
            WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
              AND o_orderpriority <> '5-LOW' AND o_orderdate IS NOT NULL"""))

  /** a4/f1 — average of a scalar function of a string column.
    * Ref: demo_optimized_data.py:96 (AVG(LENGTH(comment))). */
  val a4 = Q(
    "a4_avg_strlen",
    (s, d) =>
      Tables.documents(s, d)
        .agg(round(avg(length(col("text"))), 4).as("avg_len")),
    Some("SELECT ROUND(AVG(LENGTH(text)), 4) AS avg_len FROM documents"))

  /** a5 — multi-key group + order + limit (top-k commenters analog).
    * Ref: demo_optimized_data.py:97-104. Deterministic tiebreak on the
    * group keys so the oracle compare is order-stable. */
  val a5 = Q(
    "a5_topk_group",
    (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("c_mktsegment"), col("c_nationkey"))
        .limit(5),
    Some("""SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt
            FROM customer GROUP BY c_mktsegment, c_nationkey
            ORDER BY cnt DESC, c_mktsegment, c_nationkey LIMIT 5"""))

  /** a6/f7 — group-by derived date, top-k days.
    * Ref: demo_optimized_data.py:105-111 (DATE(postedDate) peak days).
    * Group on `to_date` (the 4-byte day int), format AFTER the
    * aggregate: the string render then runs on ≤n_distinct_days rows
    * instead of every fact row, and the partial aggregate hashes ints
    * rather than 10-char strings. Catalyst cannot reorder this itself
    * (the projection defines the grouping key). Output is identical —
    * yyyy-MM-dd is lexicographically date-ordered. */
  val a6 = Q(
    "a6_date_topk",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          date_format(col("d"), "yyyy-MM-dd").as("order_date"),
          col("cnt"))
        .orderBy(col("cnt").desc, col("order_date"))
        .limit(5),
    Some("""SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
                   COUNT(*) AS cnt
            FROM orders GROUP BY 1 ORDER BY cnt DESC, order_date LIMIT 5"""))

  /** a7 — exact distinct counts. Ref: demo_optimized_data.py:56
    * (nunique), simple_iceberg_exploration.py:360 (unique_count).
    * At 100 TB the default would be approx_count_distinct (HLL++,
    * no shuffle of raw values); exact kept here for oracle parity —
    * see ProfileQueries.a7approx for the scale path. */
  val a7 = Q(
    "a7_distinct",
    (s, d) =>
      Tables.orders(s, d).agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio")),
    Some("""SELECT COUNT(DISTINCT o_custkey) AS n_cust,
                   COUNT(DISTINCT o_orderpriority) AS n_prio FROM orders"""))

  /** a8 — boolean-predicate sums (has_attachments.sum() analog).
    * Ref: demo_optimized_data.py:57-58. COUNT(CASE WHEN) keeps both
    * engines in BIGINT (DuckDB SUM(int) would widen to HUGEINT). */
  val a8 = Q(
    "a8_bool_sum",
    (s, d) =>
      Tables.lineitem(s, d).agg(
        count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
        count(when(col("l_discount") > 0.05, 1)).as("n_discounted")),
    Some("""SELECT COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
                   COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted
            FROM lineitem"""))

  /** a9 — numeric summary: mean/median/min/max.
    * Ref: demo_optimized_data.py:62-65. Exact interpolated median
    * (percentile 0.5) matches DuckDB MEDIAN; at 100 TB swap for
    * percentile_approx (t-digest sketch, mergeable across executors). */
  val a9 = Q(
    "a9_numeric_summary",
    (s, d) =>
      Tables.lineitem(s, d).agg(
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("med_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty")),
    Some("""SELECT ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(MEDIAN(l_quantity), 4) AS med_qty,
                   MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
            FROM lineitem"""))

  /** a10 — min/max over timestamps (posted-date range).
    * Ref: demo_optimized_data.py:76. */
  val a10 = Q(
    "a10_ts_range",
    (s, d) =>
      Tables.orders(s, d).agg(
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_day"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_day")),
    Some("""SELECT CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS first_day,
                   CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS last_day
            FROM orders"""))

  /** a11 — null-profile aggregation in ONE pass over the table (not one
    * job per column). Ref: simple_iceberg_exploration.py:356-364,
    * demo_optimized_data.py:142-148. */
  val a11 = Q(
    "a11_null_profile",
    (s, d) =>
      Tables.events(s, d).agg(
        count(lit(1)).as("n_rows"),
        count(when(col("props").isNull, 1)).as("null_props"),
        count(when(col("value").isNull, 1)).as("null_value"),
        count(when(col("ts").isNull, 1)).as("null_ts")),
    Some("""SELECT COUNT(*) AS n_rows,
                   COUNT(CASE WHEN props IS NULL THEN 1 END) AS null_props,
                   COUNT(CASE WHEN value IS NULL THEN 1 END) AS null_value,
                   COUNT(CASE WHEN ts IS NULL THEN 1 END) AS null_ts
            FROM events"""))

  /** a12 — value-distribution profile (value_counts analog).
    * Ref: demo_optimized_data.py:157-169. */
  val a12 = Q(
    "a12_value_dist",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("val"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("val")),
    Some("""SELECT o_orderpriority AS val, COUNT(*) AS cnt
            FROM orders GROUP BY 1 ORDER BY cnt DESC, val"""))

  /** o1 — ORDER BY … LIMIT top-k → TakeOrderedAndProject (bounded heap
    * per partition, never a full sort). Ref: demo_optimized_data.py:101-110. */
  val o1 = Q(
    "o1_topk_order",
    (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** o2 — deterministic row peek (bare LIMIT in the reference; ordered
    * here so the oracle compare is stable).
    * Ref: simple_iceberg_exploration.py:324-327. */
  val o2 = Q(
    "o2_limit_peek",
    (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(10),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            ORDER BY l_orderkey, l_linenumber LIMIT 10"""))

  /** p4 — single-key equality filter (agency filter analog); pushes to
    * the parquet scan, and becomes partition pruning under a
    * partitionBy layout (see sources.ParquetSink).
    * Ref: convert_to_iceberg.py:1172-1176. */
  val p4 = Q(
    "p4_filter_eq",
    (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
        .limit(50),
    Some("""SELECT event_id, user_id, value FROM events
            WHERE event_type = 'purchase' ORDER BY event_id LIMIT 50"""))

  /** p6 — the predicate-vocabulary surface the reference imported but
    * never wired (pyiceberg expressions, iceberg_exploration.py:32-36):
    * between / IN / LIKE-prefix / inequality, all as Column algebra that
    * Catalyst pushes to parquet. */
  val p6 = Q(
    "p6_predicates",
    (s, d) =>
      Tables.part(s, d)
        .filter(
          col("p_size").between(10, 30) &&
            col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
            col("p_type").startsWith("S") &&
            col("p_retailprice") >= 900.0)
        .select("p_partkey", "p_name", "p_brand", "p_size")
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name, p_brand, p_size FROM part
            WHERE p_size BETWEEN 10 AND 30
              AND p_brand IN ('Brand#1','Brand#2','Brand#3')
              AND p_type LIKE 'S%' AND p_retailprice >= 900.0
            ORDER BY p_partkey"""))

  /** f2 — substring text search (LIKE '%health%' analog).
    * Ref: simple_iceberg_exploration.py:324, demo_optimized_data.py:112. */
  val f2 = Q(
    "f2_text_search",
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("text").contains("spark"))
        .agg(count(lit(1)).as("cnt")),
    Some("SELECT COUNT(*) AS cnt FROM documents WHERE text LIKE '%spark%'"))

  /** f3/f5/f6/f1 — string function suite: upper, length, concat,
    * substring, split_part, regexp_extract.
    * Ref: convert_to_iceberg.py:407-409,1175; simple_iceberg_exploration.py:215. */
  val fStrings = Q(
    "f_strings",
    (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit("_"), col("p_type")).as("brand_type"),
        substring(col("p_type"), 1, 3).as("type_pfx"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("re_word"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, UPPER(p_brand) AS brand_u,
                   CAST(LENGTH(p_name) AS BIGINT) AS name_len,
                   CONCAT(p_brand, '_', p_type) AS brand_type,
                   SUBSTRING(p_type, 1, 3) AS type_pfx,
                   SPLIT_PART(p_name, ' ', 1) AS first_word,
                   REGEXP_EXTRACT(p_name, '^([a-z]+)', 1) AS re_word
            FROM part ORDER BY p_partkey"""))

  /** f7 — date bucketing/extraction suite (to_date / year / month).
    * Ref: demo_optimized_data.py:74-78,106-109. */
  val fDates = Q(
    "f_dates",
    (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
        .orderBy("o_orderkey")
        .limit(100),
    Some("""SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od,
                   EXTRACT(year FROM o_orderdate) AS yr,
                   EXTRACT(month FROM o_orderdate) AS mo
            FROM orders ORDER BY o_orderkey LIMIT 100"""))

  /** f9 — JSON field extraction from a string column (the reference
    * parses raw JSON:API files — convert_to_iceberg.py:253-256; the
    * events.props column carries the same need at query time). */
  val f9 = Q(
    "f9_json_extract",
    (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
        .limit(100),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events ORDER BY event_id LIMIT 100"""))

  /** f10 — null handling: coalesce / nullif.
    * Ref: iceberg_exploration.py:149, simple_iceberg_exploration.py:325. */
  val f10 = Q(
    "f10_coalesce",
    (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        coalesce(nullif(col("event_type"), lit("error")), lit("unknown"))
          .as("etype"))
        .orderBy("event_id")
        .limit(100),
    Some("""SELECT event_id,
                   COALESCE(NULLIF(event_type, 'error'), 'unknown') AS etype
            FROM events ORDER BY event_id LIMIT 100"""))

  /** f11 — column arithmetic (revenue/charge expressions; compression-
    * ratio style math). Ref: simple_iceberg_exploration.py:144,175,234. */
  val f11 = Q(
    "f11_arithmetic",
    (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 2).as("charge"))
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500),
    Some("""SELECT l_orderkey, l_linenumber,
                   ROUND(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 2)
                     AS charge
            FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500"""))

  def all: Seq[Q] = Seq(
    a1, a2, a3, a4, a5, a6, a7, a8, a9, a10, a11, a12,
    o1, o2, p4, p6, f2, fStrings, fDates, f9, f10, f11)
}
