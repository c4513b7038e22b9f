package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-profiling pass (SURVEY §2.4 A7/A11–A13). The reference profiles
  * per column with eager pandas (`simple_iceberg_exploration.py:344-378`,
  * `demo_optimized_data.py:137-169`) — one pass per statistic. Here the
  * whole profile is ONE distributed pass: a single wide aggregate row
  * (count + non-null count + distinct per column) melted to long format
  * with `stack`.
  *
  * Scale note: `countDistinct` over many columns plans an Expand (one
  * shuffle, data duplicated per distinct column) — acceptable for a
  * profiling pass; the 100 TB default is `approx_count_distinct` (HLL++
  * sketch, map-side mergeable, no raw-value shuffle), exposed in
  * `profileApprox`.
  */
object ProfileQueries {

  /** Generic schema-driven profile: (col_name, n_nonnull, n_distinct). */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', `nn_$c`, `nd_$c`").mkString(", ")
    wide
      .selectExpr(
        s"stack(${cols.length}, $stackArgs) AS (col_name, n_nonnull, n_distinct)")
      .orderBy("col_name")
  }

  /** Same profile with HLL++ distinct sketches — the 100 TB default. */
  def profileApprox(df: DataFrame, rsd: Double = 0.05): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      approx_count_distinct(col(c), rsd).as(s"nd_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', `nn_$c`, `nd_$c`").mkString(", ")
    wide
      .selectExpr(
        s"stack(${cols.length}, $stackArgs) AS (col_name, n_nonnull, n_distinct)")
      .orderBy("col_name")
  }

  /** a13 — exact one-pass profile of `orders`, oracle-checked. */
  val a13 = Q(
    "a13_column_profile",
    (s, d) => profile(Tables.orders(s, d)),
    Some(Seq("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
      "o_orderstatus", "o_totalprice")
      .map(c =>
        s"""SELECT '$c' AS col_name, COUNT($c) AS n_nonnull,
              COUNT(DISTINCT $c) AS n_distinct FROM orders""")
      .mkString("", " UNION ALL ", " ORDER BY col_name")))

  /** a7x — approx distinct (HLL++), oracle-checked as a tolerance
    * assertion: the sketch estimate itself is engine-specific (DuckDB
    * cannot reproduce Spark's HLL++), but |approx − exact| ≤ 15% of
    * exact is a deterministic boolean — HLL++ register merge is
    * order-independent, so the estimate doesn't vary with
    * partitioning — and the oracle recomputes the exact count and
    * asserts TRUE. Pins both the exact path and the sketch's accuracy
    * contract (rsd 0.05; 15% = 3σ headroom, zero flake risk). */
  val a7x = Q(
    "a7x_approx_distinct",
    (s, d) =>
      Tables.orders(s, d).agg(
        countDistinct(col("o_custkey")).as("exact_cust"),
        approx_count_distinct(col("o_custkey"), 0.05).as("approx_raw"))
        .select(
          col("exact_cust"),
          (abs(col("approx_raw") - col("exact_cust")) <=
            col("exact_cust").cast("double") * 0.15).as("within_tol")),
    Some("""SELECT COUNT(DISTINCT o_custkey) AS exact_cust,
                   TRUE AS within_tol
            FROM orders"""))

  /** dtype profile (A13 metadata half): schema-only, no scan at all. */
  def dtypes(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, table).schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, f.nullable))
      .toDF("col_name", "dtype", "nullable")
  }

  /** a13x — dtype profile, oracle-checked: both engines read the same
    * parquet footer and the SQL maps DuckDB's type names onto Spark's
    * `simpleString`s (BIGINT→bigint, VARCHAR→string, naive
    * TIMESTAMP→timestamp_ntz — DuckDB TIMESTAMP is wall-clock, which
    * is exactly Spark's TIMESTAMP_NTZ; TIMESTAMPTZ would be Spark's
    * session-zoned timestamp). Schema drift in the fixture changes
    * both sides together, so this pins the MAPPING, not a frozen
    * literal list. */
  val a13x = Q(
    "a13x_dtypes",
    (s, d) => dtypes(s, d, "orders").orderBy("col_name"),
    Some("""SELECT column_name AS col_name,
                   CASE column_type
                     WHEN 'BIGINT' THEN 'bigint'
                     WHEN 'INTEGER' THEN 'int'
                     WHEN 'DOUBLE' THEN 'double'
                     WHEN 'FLOAT' THEN 'float'
                     WHEN 'VARCHAR' THEN 'string'
                     WHEN 'DATE' THEN 'date'
                     WHEN 'BOOLEAN' THEN 'boolean'
                     WHEN 'TIMESTAMP' THEN 'timestamp_ntz'
                     WHEN 'TIMESTAMP WITH TIME ZONE' THEN 'timestamp'
                     ELSE lower(column_type)
                   END AS dtype,
                   ("null" = 'YES') AS nullable
            FROM (DESCRIBE SELECT * FROM orders)
            ORDER BY col_name"""))

  def all: Seq[Q] = Seq(a13, a7x, a13x)
}
