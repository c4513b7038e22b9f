package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-mitigation operators. AQE's skew-join splitting (enabled in
  * GraftSession) handles skewed JOINS at runtime; a skewed GROUP BY
  * key needs salting — the classic two-phase aggregate:
  *
  *   phase 1: group by (key, salt) where salt = hash(row) % S
  *            → S partial rows per hot key, spread over S reducers
  *   phase 2: group by key over the partials
  *
  * Results are EXACTLY the plain aggregate's (oracle: the unsalted
  * SQL); the only change is where the work lands. At 100 TB a handful
  * of hot agencies (the reference corpus has 25k-comment dockets next
  * to empty ones) would otherwise pin single reducers.
  */
object SkewQueries {

  /** Two-phase salted count+sum per key. Decomposable aggregates only
    * (count/sum/min/max compose; avg = sum/count at phase 2). */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int = 16): DataFrame =
    df
      .withColumn("_salt",
        pmod(xxhash64(col(valueCol), monotonically_increasing_id()),
          lit(saltBuckets)))
      .groupBy(col(key), col("_salt"))
      .agg(
        count(lit(1)).as("_cnt"),
        sum(col(valueCol)).as("_sum"))
      .groupBy(col(key))
      .agg(
        sum(col("_cnt")).as("cnt"),
        round(sum(col("_sum")), 2).as("total"))

  /** Salted group-by whose oracle is the PLAIN group-by — proves the
    * two-phase rewrite is result-identical.
    *
    * Honest scope note (measured in SkewSpec on a 50%-hot-key
    * fixture): for decomposable aggregates Spark's map-side partial
    * aggregation already collapses a hot key to one row per map task,
    * so the UNSALTED plan is not actually skewed and the salted twin
    * cannot beat it — the rewrite is kept as the mechanics for
    * aggregation shapes/engines without partials. The skew cases that
    * genuinely concentrate work in this engine are joins (AQE skew
    * split, SkewJoinSpec) and per-key windows (bucketed as-of join,
    * SkewSpec), both of which are pinned to spread the hot key at the
    * task level. */
  val a2s = Q(
    "a2s_salted_groupby",
    (s, d) =>
      saltedAgg(Tables.lineitem(s, d), "l_returnflag", "l_quantity")
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, COUNT(*) AS cnt,
                   ROUND(SUM(l_quantity), 2) AS total
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  def all: Seq[Q] = Seq(a2s)
}
