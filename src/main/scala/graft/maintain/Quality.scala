package graft.maintain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks, one distributed pass.
  *
  * The reference eyeballs data health through ad-hoc pandas probes
  * (explore_data_structure.py, demo_optimized_data.py:137-169); a
  * pipeline feeding training jobs needs the checks as code with a
  * machine-readable verdict. Every scalar constraint compiles to a
  * violation-counting aggregate column, so the whole report is ONE
  * wide aggregate row melted to (check, violations, passed) — the
  * same single-pass shape as ProfileQueries. Referential integrity
  * needs the other table, so it rides along as an anti-join count
  * unioned into the same lazy plan (one action still computes the
  * full report).
  *
  * At 100 TB: the scalar checks are map-side partial aggregates (one
  * row per map task crosses the wire); the RI check is a semi-join
  * shape — broadcast when the reference side is a dimension, shuffled
  * otherwise, and bloom-prunable via operators/BloomJoin when the
  * fact side dominates.
  */
object Quality {

  /** A named constraint: `violations` must be an aggregate expression
    * counting offending rows (0 ⇒ passed). */
  final case class Check(name: String, violations: Column)

  def notNull(c: String): Check =
    Check(s"not_null:$c", count(when(col(c).isNull, 1)))

  /** Duplicate non-null values (count − distinct; NULLs are the
    * business of notNull, not uniqueness). */
  def unique(c: String): Check =
    Check(s"unique:$c", count(col(c)) - countDistinct(col(c)))

  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"in_range:$c",
      count(when(col(c) < lo || col(c) > hi, 1)))

  def matches(c: String, regex: String): Check =
    Check(s"matches:$c",
      count(when(col(c).isNotNull && !col(c).rlike(regex), 1)))

  def nonNegative(c: String): Check = inRange(c, 0.0, Double.MaxValue)

  /** Scalar-constraint report: one aggregate, melted. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.violations.cast("long").as(s"v_$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.zipWithIndex
      .map { case (c, i) => s"'${c.name}', `v_$i`" }.mkString(", ")
    wide.selectExpr(
        s"stack(${checks.length}, $stackArgs) AS (check, violations)")
      .withColumn("passed", col("violations") === 0L)
  }

  /** Referential-integrity row: values of `df.keyCol` absent from
    * `ref.refCol` (NULL keys are notNull's business). Same output
    * schema as `report`, for unioning into one plan. */
  def referential(
      df: DataFrame, keyCol: String,
      ref: DataFrame, refCol: String,
      refName: String): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .join(ref.select(col(refCol).as(keyCol)), Seq(keyCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(
        lit(s"ri:$keyCol->$refName").as("check"),
        col("violations"),
        (col("violations") === 0L).as("passed"))

  /** Full report: scalar checks + optional RI rows, one lazy plan. */
  def fullReport(
      df: DataFrame,
      checks: Seq[Check],
      ri: Seq[DataFrame] = Nil): DataFrame =
    ri.foldLeft(report(df, checks))(_ unionByName _)
      .orderBy("check")
}
