package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Breadth extensions past SURVEY §2: canonical TPC-H pricing/priority
  * queries, grouping sets, pivot/unpivot reshaping, subquery forms
  * (EXISTS, scalar), a time-range window frame, and string-distance /
  * regex / tokenization analytics. All oracle-verified against DuckDB
  * on the same parquet.
  *
  * Scale notes per query are inline; the common themes:
  *   - every aggregate is a hash-agg with map-side partial combine;
  *   - the only joins are broadcast (dim side) or key-shuffles Catalyst
  *     plans as SMJ — no cartesian anywhere;
  *   - window frames partition on a real key (never a global window);
  *   - per-row string ops (levenshtein, regexp) are narrow — they
  *     pipeline inside whole-stage codegen with zero shuffle.
  */
object ExtendedQueries {

  /** TPC-H Q1: pricing summary report. One scan, one shuffle on the
    * 6-value (returnflag, linestatus) key; partial aggregation does
    * nearly all the work map-side, so at 100 TB the shuffle carries
    * ~6 rows per task. */
  val tpchQ1 = Q(
    "tpch_q1",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_extendedprice), 4) AS avg_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2000-12-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** TPC-H Q3: shipping priority. customer is the broadcast dim;
    * orders⋈lineitem shuffles once on orderkey; the top-10 is
    * TakeOrderedAndProject (never a global sort). */
  val tpchQ3 = Q(
    "tpch_q3",
    (s, d) => {
      val cutoff = to_timestamp(lit("1996-03-15"))
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      ord
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .select(
          col("l_orderkey"),
          col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey,
                   ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
                   strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                   o_orderpriority
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1996-03-15'
              AND l_shipdate > TIMESTAMP '1996-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10"""))

  /** GROUPING SETS — the third member of the rollup/cube family
    * (a14/a14x), via the SAME SQL text in both engines. Catalyst plans
    * one Expand + one hash-agg: rows duplicate ×|sets| map-side, but
    * partial aggregation collapses them before the shuffle. */
  private val groupingSetsSql =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS pr,
              COALESCE(o_orderstatus, 'ALL') AS st,
              COUNT(*) AS cnt,
              ROUND(SUM(o_totalprice), 2) AS revenue
       FROM orders
       GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
       ORDER BY pr, st"""

  val g1 = Q(
    "g1_grouping_sets",
    (s, d) => SqlQueries.sql(s, d, groupingSetsSql),
    Some(groupingSetsSql))

  /** Pivot: long→wide reshape, counts of priority per status. The
    * pivot values are explicit, so the schema is fixed at plan time
    * (no driver-side distinct scan) — mandatory at scale. */
  val pv1 = Q(
    "pv1_pivot",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(
          col("o_orderstatus"),
          coalesce(col("`1-URGENT`"), lit(0L)).as("n_urgent"),
          coalesce(col("`2-HIGH`"), lit(0L)).as("n_high"),
          coalesce(col("`3-MEDIUM`"), lit(0L)).as("n_medium"),
          coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("n_notspec"),
          coalesce(col("`5-LOW`"), lit(0L)).as("n_low"))
        .orderBy("o_orderstatus"),
    Some("""SELECT o_orderstatus,
                   COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
                   COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS n_high,
                   COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_medium,
                   COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
                   COUNT(*) FILTER (o_orderpriority = '5-LOW') AS n_low
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Unpivot (melt): wide→long reshape via the Dataset.unpivot API —
    * a Generate over already-aggregated rows, so the expansion is a
    * few dozen rows regardless of input scale. */
  val uv1 = Q(
    "uv1_unpivot",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          round(sum(col("o_totalprice")), 2).as("total_price"),
          round(avg(col("o_totalprice")), 2).as("avg_price"),
          count(lit(1)).cast("double").as("n_orders"))
        .unpivot(
          Array(col("o_orderstatus")),
          Array(col("total_price"), col("avg_price"), col("n_orders")),
          "metric", "val")
        .orderBy("o_orderstatus", "metric"),
    Some("""WITH agg AS (
              SELECT o_orderstatus,
                     ROUND(SUM(o_totalprice), 2) AS total_price,
                     ROUND(AVG(o_totalprice), 2) AS avg_price,
                     CAST(COUNT(*) AS DOUBLE) AS n_orders
              FROM orders GROUP BY o_orderstatus)
            SELECT o_orderstatus, 'total_price' AS metric, total_price AS val FROM agg
            UNION ALL
            SELECT o_orderstatus, 'avg_price', avg_price FROM agg
            UNION ALL
            SELECT o_orderstatus, 'n_orders', n_orders FROM agg
            ORDER BY o_orderstatus, metric"""))

  /** Correlated EXISTS subquery — same SQL text in both engines.
    * Catalyst rewrites it to a left-semi hash join (RewritePredicateSubquery);
    * PlanSpec asserts no nested-loop appears. */
  private val existsSql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_orderpriority = '1-URGENT')
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  val sq1 = Q(
    "sq1_exists_subquery",
    (s, d) => SqlQueries.sql(s, d, existsSql),
    Some(existsSql))

  /** Scalar subquery — the inner aggregate runs once and broadcasts as
    * a literal into the outer filter (no per-row re-execution). */
  private val scalarSql =
    """SELECT o_orderstatus, COUNT(*) AS n_above
       FROM orders
       WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  val sq2 = Q(
    "sq2_scalar_subquery",
    (s, d) => SqlQueries.sql(s, d, scalarSql),
    Some(scalarSql))

  /** Time-range window frame: per-user trailing-1-hour sum/count over
    * event time (RANGE, not ROWS — frame by value, robust to ties).
    * Partitioned by user_id: one shuffle, per-key sorted scan. */
  val w5 = Q(
    "w5_range_frame",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_s")
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d)
        .withColumn("ts_s", col("ts").cast("long"))
        .select(
          col("user_id"), col("event_id"), col("ts_s"),
          round(sum(col("value")).over(w), 2).as("hr_sum"),
          count(lit(1)).over(w).as("hr_n"))
        .orderBy("user_id", "event_id")
        .limit(500)
    },
    Some("""SELECT user_id, event_id, ts_s,
                   ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts_s
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS hr_sum,
                   COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_s
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS hr_n
            FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events)
            ORDER BY user_id, event_id LIMIT 500"""))

  /** Edit-distance histogram: levenshtein from every part type to a
    * probe string. Per-row narrow compute + tiny agg — the fuzzy-match
    * primitive for catalog reconciliation, fully codegen'd. */
  val f13 = Q(
    "f13_edit_distance",
    (s, d) =>
      Tables.part(s, d)
        .select(levenshtein(col("p_type"), lit("PROMO POLISHED BRASS"))
          .cast("long").as("dist"))
        .groupBy("dist")
        .agg(count(lit(1)).as("n"))
        .orderBy("dist"),
    Some("""SELECT levenshtein(p_type, 'PROMO POLISHED BRASS') AS dist,
                   COUNT(*) AS n
            FROM part GROUP BY 1 ORDER BY dist"""))

  /** regexp_extract_all: per-document number extraction (count + first
    * match). Row-local regex inside codegen; no shuffle before the
    * deterministic order/limit. */
  val f14 = Q(
    "f14_regex_extract_all",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
            .cast("long").as("n_numbers"),
          regexp_extract(col("text"), "[0-9]+", 0).as("first_number"))
        .orderBy("doc_id")
        .limit(300),
    Some("""SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
                   COALESCE(regexp_extract(text, '[0-9]+'), '') AS first_number
            FROM documents ORDER BY doc_id LIMIT 300"""))

  /** Token explode: whitespace-split + explode + frequency top-20 —
    * the term-frequency building block. The explode is a Generate
    * (narrow); the only shuffle is the token group-by, with map-side
    * partial counts doing the heavy lifting. */
  val e1 = Q(
    "e1_explode_tokens",
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20),
    Some("""SELECT token, COUNT(*) AS n
            FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token
                  FROM documents)
            WHERE token <> ''
            GROUP BY token ORDER BY n DESC, token LIMIT 20"""))

  /** Bivariate statistics: correlation / sample covariance / sample
    * stddev in ONE pass (single hash-agg, no shuffle beyond the final
    * 1-row combine). */
  val a17 = Q(
    "a17_corr_stats",
    (s, d) =>
      Tables.lineitem(s, d)
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
            .as("covar_qty_price"),
          round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
          round(var_samp(col("l_tax")), 6).as("var_tax")),
    Some("""SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
                   ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
                   ROUND(stddev_samp(l_discount), 6) AS sd_disc,
                   ROUND(var_samp(l_tax), 6) AS var_tax
            FROM lineitem"""))

  /** Higher-order array functions over the embedding column: lambda
    * filter / left-fold aggregate / element-wise zip_with. Row-local
    * (no shuffle before the order/limit); note these lambdas run
    * interpreted — the HOT paths (minhash, dot products) use the
    * codegen expressions in graft.functions instead, and this query
    * exists to cover the declarative API surface. Both engines fold
    * left-to-right over array<double>, so sums are bit-identical. */
  val hof1 = Q(
    "hof1_array_ops",
    (s, d) => {
      val emb = col("embedding").cast("array<double>")
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(filter(emb, x => x > 0d)).cast("long").as("n_pos"),
          round(aggregate(emb, lit(0.0d), (acc, x) => acc + x), 6)
            .as("sum_e"),
          round(aggregate(zip_with(emb, emb, (a, b) => a * b),
            lit(0.0d), (acc, x) => acc + x), 6).as("sq_sum"))
        .orderBy("vec_id")
        .limit(200)
    },
    Some("""SELECT vec_id,
                   CAST(len(list_filter(e, x -> x > 0)) AS BIGINT) AS n_pos,
                   ROUND(list_sum(e), 6) AS sum_e,
                   ROUND(list_sum(list_transform(e, x -> x * x)), 6) AS sq_sum
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                  FROM embeddings)
            ORDER BY vec_id LIMIT 200"""))

  /** One event row under the typed Dataset API. */
  final case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double,
      props: String)

  /** Typed Dataset pipeline: case-class Encoder → filter on fields →
    * `groupByKey` → `mapValues` → `reduceGroups` — the compile-time-
    * checked API surface. reduceGroups partial-reduces map-side (same
    * shuffle profile as an untyped sum); the lambda costs encoder
    * serialization vs codegen, which is why the engine's hot paths
    * stay in Column algebra — this query covers the API, with the
    * oracle proving result parity. */
  val t1 = Q(
    "t1_typed_pipeline",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d).as[Event]
        .filter(e => e.value > 0 && e.event_type != "error")
        .groupByKey(_.event_type)
        .mapValues(e => (e.value, 1L))
        .reduceGroups((a, b) => (a._1 + b._1, a._2 + b._2))
        .map { case (k, (sum, n)) =>
          (k, BigDecimal(sum).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            .toDouble, n)
        }
        .toDF("event_type", "total_value", "n_events")
        .orderBy("event_type")
    },
    Some("""SELECT event_type, ROUND(SUM(value), 2) AS total_value,
                   COUNT(*) AS n_events
            FROM events
            WHERE value > 0 AND event_type <> 'error'
            GROUP BY event_type ORDER BY event_type"""))

  /** MERGE-like upsert semantics (graft.maintain.Upsert): double the
    * price of every 10th order as an "update" batch with a later
    * version timestamp, merge latest-wins by key, and summarize. One
    * union + one windowed shuffle on the key — no join. The oracle is
    * DuckDB's QUALIFY row_number formulation of the same MERGE. */
  val m1 = Q(
    "m1_upsert_merge",
    (s, d) => {
      val t = Tables.orders(s, d)
      val upd = t.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2))
        .withColumn("o_orderdate", to_timestamp(lit("2002-01-01")))
      graft.maintain.Upsert
        .mergeFrames(t, upd, Seq("o_orderkey"), "o_orderdate", "o_orderkey")
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")), 2).as("total_price"),
          count(when(col("o_orderdate") === to_timestamp(lit("2002-01-01")),
            1)).as("n_updated"))
    },
    Some("""WITH upd AS (
              SELECT o_orderkey, o_custkey, o_orderstatus,
                     ROUND(o_totalprice * 2, 2) AS o_totalprice,
                     TIMESTAMP '2002-01-01' AS o_orderdate,
                     o_orderpriority
              FROM orders WHERE o_orderkey % 10 = 0),
            merged AS (
              SELECT * FROM (SELECT * FROM orders UNION ALL SELECT * FROM upd)
              QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) = 1)
            SELECT COUNT(*) AS n_rows,
                   ROUND(SUM(o_totalprice), 2) AS total_price,
                   COUNT(*) FILTER (o_orderdate = TIMESTAMP '2002-01-01')
                     AS n_updated
            FROM merged"""))

  /** Spark 4 VariantType: parse the JSON props column ONCE into a
    * variant (binary semi-structured encoding — no per-access string
    * re-parse, the modern replacement for repeated get_json_object
    * calls) and aggregate a typed path extraction. */
  val v1 = Q(
    "v1_variant_json",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          try_variant_get(parse_json(col("props")), "$.k", "long").as("k"))
        .groupBy("event_type")
        .agg(
          count(col("k")).as("n_with_k"),
          round(avg(col("k")), 4).as("avg_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
                   COUNT(k) AS n_with_k,
                   ROUND(AVG(k), 4) AS avg_k,
                   MIN(k) AS min_k,
                   MAX(k) AS max_k
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                  FROM events)
            GROUP BY event_type ORDER BY event_type"""))

  /** FULL OUTER join of two pre-aggregated sides (users who clicked vs
    * users who purchased — either side can be unmatched). Both sides
    * reduce BEFORE the join, so the shuffle carries one row per user,
    * not one per event; with AQE both aggregates and the join share
    * the user_id hash partitioning. */
  val j7 = Q(
    "j7_full_outer",
    (s, d) => {
      val ev = Tables.events(s, d)
      def side(t: String, as: String) =
        ev.filter(col("event_type") === t)
          .groupBy("user_id").agg(count(lit(1)).as(as))
      val c = side("click", "n_click").alias("c")
      val p = side("purchase", "n_purchase").alias("p")
      c.join(p, col("c.user_id") === col("p.user_id"), "full_outer")
        .select(
          coalesce(col("c.user_id"), col("p.user_id")).as("user_id"),
          col("n_click"), col("n_purchase"))
        .orderBy("user_id")
    },
    Some("""SELECT COALESCE(c.user_id, p.user_id) AS user_id,
                   n_click, n_purchase
            FROM (SELECT user_id, COUNT(*) AS n_click FROM events
                  WHERE event_type = 'click' GROUP BY user_id) c
            FULL JOIN (SELECT user_id, COUNT(*) AS n_purchase FROM events
                  WHERE event_type = 'purchase' GROUP BY user_id) p
              ON c.user_id = p.user_id
            ORDER BY user_id"""))

  /** Null-safe equality join (<=>): NULL keys match NULL, the MERGE /
    * dimension-with-unknown-member pattern plain `=` silently drops.
    * The dim side is distinct + broadcast. The grouped output labels
    * the null key so row ordering is engine-neutral. */
  val j8 = Q(
    "j8_nullsafe_join",
    (s, d) => {
      val k = when(col("lang") === "en", lit(null)).otherwise(col("lang"))
      val fact = Tables.documents(s, d).select(k.as("k"))
      val dim = fact.distinct().withColumnRenamed("k", "dk")
      fact.join(broadcast(dim), col("k") <=> col("dk"))
        .groupBy(coalesce(col("dk"), lit("(null)")).as("k_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k_label")
    },
    Some("""WITH f AS (
              SELECT CASE WHEN lang = 'en' THEN NULL ELSE lang END AS k
              FROM documents),
            dim AS (SELECT DISTINCT k AS dk FROM f)
            SELECT COALESCE(dim.dk, '(null)') AS k_label, COUNT(*) AS n
            FROM f JOIN dim ON f.k IS NOT DISTINCT FROM dim.dk
            GROUP BY 1 ORDER BY k_label"""))

  /** posexplode: token position is first-class (the order-preserving
    * flatten every sequence-labeling pipeline needs). Narrow Generate,
    * no shuffle before the final order-for-display. */
  val e2 = Q(
    "e2_posexplode",
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 10)
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("token"))
        .orderBy("doc_id", "pos"),
    Some("""SELECT doc_id, pos, token FROM (
              SELECT doc_id,
                     unnest(range(0, len(toks))) AS pos,
                     unnest(toks) AS token
              FROM (SELECT doc_id,
                           string_split_regex(trim(text), '\s+') AS toks
                    FROM documents WHERE doc_id < 10))
            ORDER BY doc_id, pos"""))

  /** Map-typed column plumbing: build a map from columns, extract by
    * key, enumerate keys. The oracle states the equivalent flat
    * values — what matters is that the map round-trip reproduces them
    * exactly. Keys are emitted as one joined string so the result is
    * hashable by any downstream comparator. */
  val f15 = Q(
    "f15_map_ops",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          map(lit("lang"), col("lang"), lit("source"), col("source"))
            .as("m"))
        .select(
          col("doc_id"),
          element_at(col("m"), "lang").as("lang_val"),
          element_at(col("m"), "source").as("source_val"),
          size(col("m")).cast("long").as("n_keys"),
          array_join(sort_array(map_keys(col("m"))), ",").as("keys_sorted"))
        .orderBy("doc_id")
        .limit(200),
    Some("""SELECT doc_id, lang AS lang_val, source AS source_val,
                   CAST(2 AS BIGINT) AS n_keys,
                   'lang,source' AS keys_sorted
            FROM documents ORDER BY doc_id LIMIT 200"""))

  /** Ordered string aggregation (group members joined into one string
    * — the classic report/export shape). Deterministic via sorted
    * distinct members; collect_set stays small (bounded by the source
    * cardinality), never an unbounded fact column. */
  val f16 = Q(
    "f16_string_agg",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(
          // concat_ws of an empty set is "" but SQL string_agg of
          // no non-null members is NULL — mirror the SQL semantics
          // so an all-null group can never diverge from the oracle
          when(size(sort_array(collect_set(col("source")))) > 0,
            concat_ws(",", sort_array(collect_set(col("source")))))
            .as("sources"),
          count(lit(1)).as("n"))
        .orderBy("lang"),
    Some("""SELECT lang,
                   string_agg(DISTINCT source, ',' ORDER BY source)
                     AS sources,
                   COUNT(*) AS n
            FROM documents GROUP BY lang ORDER BY lang"""))

  /** explode_outer: the null-preserving flatten — a parent row with an
    * EMPTY (or null) array still emits one row with a NULL element,
    * where plain explode silently drops it (the LEFT JOIN vs INNER
    * JOIN of flattening). Empty arrays are synthesized for every 7th
    * doc since the fixture corpus has none. */
  val e3 = Q(
    "e3_explode_outer",
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          explode_outer(
            when(pmod(col("doc_id"), lit(7)) === 0,
              array().cast("array<string>"))
              .otherwise(split(trim(col("text")), "\\s+")))
            .as("token"))
        .orderBy("doc_id", "token"),
    Some("""SELECT doc_id, unnest(
                     CASE WHEN doc_id % 7 = 0 THEN [NULL]::VARCHAR[]
                          ELSE string_split_regex(trim(text), '\s+') END)
                     AS token
            FROM documents WHERE doc_id < 50
            ORDER BY doc_id, token"""))

  /** Error-safe scalar paths under ANSI mode: the session runs
    * ANSI-strict (bad casts / zero divides THROW, catching data bugs),
    * so dirty-data columns go through try_cast / try_divide, which
    * yield NULL instead of killing a 1000-executor job on one bad
    * row. */
  val f17 = Q(
    "f17_try_cast",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0, col("doc_id").cast("string"))
            .otherwise(col("lang")).as("mixed"),
          pmod(col("doc_id"), lit(5)).cast("double").as("den"))
        .select(col("doc_id"),
          expr("try_cast(mixed AS BIGINT)").as("as_num"),
          round(expr("try_divide(doc_id, den)"), 4).as("ratio"))
        .orderBy("doc_id")
        .limit(300),
    Some("""SELECT doc_id,
                   TRY_CAST(mixed AS BIGINT) AS as_num,
                   CASE WHEN den = 0 THEN NULL
                        ELSE ROUND(doc_id / den, 4) END AS ratio
            FROM (SELECT doc_id,
                         CASE WHEN doc_id % 3 = 0
                           THEN CAST(doc_id AS VARCHAR) ELSE lang END AS mixed,
                         CAST(doc_id % 5 AS DOUBLE) AS den
                  FROM documents)
            ORDER BY doc_id LIMIT 300"""))

  def all: Seq[Q] = Seq(
    tpchQ1, tpchQ3, g1, pv1, uv1, sq1, sq2, w5, f13, f14, e1, a17, hof1,
    t1, m1, v1, j7, j8, e2, e3, f15, f16, f17)
}
