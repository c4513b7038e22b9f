package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SQL entry point (SURVEY §2.1 S9): the reference registers pandas
  * frames with an embedded DuckDB and runs SQL strings
  * (simple_iceberg_exploration.py:315-318, demo_optimized_data.py:88-89).
  * Spark-first that is temp views + spark.sql — the SAME SQL text the
  * oracle runs, parsed by Spark's ANSI front-end, planned by Catalyst.
  */
object SqlQueries {

  /** Register every synthetic table as a temp view. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(query)
  }

  /** The reference's text-search + group-by shape, expressed as ONE
    * SQL string executed by BOTH engines (identical text in query and
    * oracle — the strongest parity statement the harness can make). */
  private val sharedSql =
    """SELECT l_returnflag, COUNT(*) AS cnt,
              ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
       FROM lineitem
       WHERE l_quantity > 10.0 AND l_linestatus = 'F'
       GROUP BY l_returnflag ORDER BY l_returnflag"""

  val s9 = Q(
    "s9_sql_entry",
    (s, d) => sql(s, d, sharedSql),
    Some(sharedSql))

  /** Windowed SQL through the Spark parser (views + ANSI window;
    * partitioned window — a global ORDER BY window would funnel the
    * table through one task at scale). */
  private val sharedWindowSql =
    """SELECT * FROM (
         SELECT o_orderpriority, o_orderkey, o_totalprice,
                CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
         FROM orders) t
       WHERE rn <= 3 ORDER BY o_orderpriority, rn"""

  val s9w = Q(
    "s9_sql_window",
    (s, d) => sql(s, d, sharedWindowSql),
    Some(sharedWindowSql))

  /** Recursive CTE (Spark 4 WITH RECURSIVE) — hierarchy walking in
    * pure SQL, identical text in both engines. The hierarchy is the
    * synthetic decimal tree parent(id) = floor(id/10): every doc walks
    * its ancestor chain to the root (≤5 levels at any fixture scale —
    * recursion depth grows with log10 of the id space, comfortably
    * inside Spark's default 100-level recursion limit). */
  private val sharedRecursiveSql =
    """WITH RECURSIVE anc(doc_id, anc_id, depth) AS (
         SELECT doc_id, doc_id, 0 FROM documents
         UNION ALL
         SELECT a.doc_id, CAST(FLOOR(a.anc_id / 10.0) AS BIGINT),
                a.depth + 1
         FROM anc a WHERE a.anc_id > 0)
       SELECT depth, COUNT(*) AS n,
              CAST(MIN(anc_id) AS BIGINT) AS min_anc,
              CAST(MAX(anc_id) AS BIGINT) AS max_anc
       FROM anc GROUP BY depth ORDER BY depth"""

  val s9r = Q(
    "s9_sql_recursive",
    (s, d) => sql(s, d, sharedRecursiveSql),
    Some(sharedRecursiveSql))

  def all: Seq[Q] = Seq(s9, s9w, s9r)
}
