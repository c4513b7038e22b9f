package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` (SURVEY §2.10's custom-agg extension point):
  * discount-weighted revenue with an explicit mergeable buffer —
  * the pattern for any sketch/accumulator Spark lacks. Buffers merge
  * associatively, so the plan keeps map-side partial aggregation
  * (verified in PlanSpec for the built-ins; same HashAggregate shape
  * applies to UDAF-backed aggregates).
  *
  * The computation itself is deliberately SQL-expressible
  * (SUM(price·(1-discount)) / SUM(qty)) so the oracle can check the
  * Aggregator machinery end-to-end, not just its algebra.
  */
object RevenueAgg {

  final case class In(price: Double, discount: Double, qty: Double)
  final case class Buf(revenue: Double, qty: Double)

  val aggregator: Aggregator[In, Buf, Double] =
    new Aggregator[In, Buf, Double] {
      override def zero: Buf = Buf(0.0, 0.0)
      override def reduce(b: Buf, a: In): Buf =
        Buf(b.revenue + a.price * (1.0 - a.discount), b.qty + a.qty)
      override def merge(a: Buf, b: Buf): Buf =
        Buf(a.revenue + b.revenue, a.qty + b.qty)
      override def finish(b: Buf): Double =
        if (b.qty == 0.0) 0.0 else b.revenue / b.qty
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Register as `revenue_per_unit(price, discount, qty)`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("revenue_per_unit", udaf(aggregator))
}
