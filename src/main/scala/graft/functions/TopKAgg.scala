package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftCollectTopK
import org.apache.spark.sql.functions.{call_function, lit}

/** Bounded top-k aggregate, exposed as `collect_top_k(e, k, reverse)`.
  *
  * Thin registration shim over Catalyst's own `CollectTopK` (a
  * `Collect[BoundedPriorityQueue]` — the aggregate behind pandas-on-
  * Spark's nlargest/nsmallest), which Spark does not expose through
  * the public function registry. Why it matters here: it is the ONLY
  * built-in aggregate whose state is bounded by k rather than by
  * group size, and it participates in partial aggregation — so a
  * per-key top-k over an enormous scored frame keeps one k-sized
  * heap per key per map task and ships exactly ≤k entries per
  * (key, map task) through the exchange. That replaces the
  * sort-the-whole-partition step a window-rank plan needs
  * (`WindowGroupLimit` still sorts each map partition in full before
  * its partial limit) with O(n) heap pushes and O(keys × k) memory.
  *
  * `reverse = false` keeps the k LARGEST elements by the child type's
  * natural ordering (structs compare field by field, left to right);
  * `reverse = true` keeps the k smallest — nsmallest, the case
  * `CollectTopK` was built for (pinned in TopKAggSpec: the
  * BoundedPriorityQueue evicts its minimum under the effective
  * ordering). The result array is unordered (heap order); callers
  * re-rank the ≤k survivors.
  *
  * Used by `Similarity.knnJoin` / `hardNegatives`, where the scored
  * frame is |corpus| × |queries| rows and a per-query window over it
  * would otherwise be the scale ceiling.
  */
object TopKAgg {

  private def asInt(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  private def asBool(e: Expression): Boolean =
    e.eval(null).asInstanceOf[Boolean]

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "collect_top_k" -> ((exprs: Seq[Expression]) =>
      GraftCollectTopK(exprs(0), asInt(exprs(1)), asBool(exprs(2)))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  /** Keep the k extreme values of `e` per group (largest when
    * `reverse`, else smallest); returns an UNORDERED array. */
  def collect_top_k(e: Column, k: Int, reverse: Boolean): Column =
    call_function("collect_top_k", e, lit(k), lit(reverse))
}
