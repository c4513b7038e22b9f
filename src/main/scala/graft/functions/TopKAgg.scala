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

  /** Builder-time validation: `k` and `reverse` parameterize the
    * aggregate's state, so they must be literal-foldable at analysis
    * (same contract as Spark's own `approx_percentile` accuracy
    * argument). Without these checks a non-literal argument surfaced
    * as an opaque NPE/ClassCast from `eval(null)`; now it is an
    * AnalysisException under Spark's standard error classes. */
  private def nonFoldable(name: String, tpe: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> "`collect_top_k`",
        "paramName" -> s"`$name`",
        "paramType" -> tpe))

  private def asInt(e: Expression, name: String): Int = {
    if (!e.foldable) nonFoldable(name, "\"INT\"")
    e.eval(null) match {
      case n: Number => n.intValue()
      case _ => nonFoldable(name, "\"INT\"")
    }
  }

  private def asBool(e: Expression, name: String): Boolean = {
    if (!e.foldable) nonFoldable(name, "\"BOOLEAN\"")
    e.eval(null) match {
      case b: Boolean => b
      case _ => nonFoldable(name, "\"BOOLEAN\"")
    }
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "collect_top_k" -> ((exprs: Seq[Expression]) => {
      if (exprs.length != 3)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`collect_top_k`",
            "expectedNum" -> "3",
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      GraftCollectTopK(exprs(0), asInt(exprs(1), "k"),
        asBool(exprs(2), "reverse"))
    }))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  /** Keep the k extreme values of `e` per group (SMALLEST when
    * `reverse`, else largest — pinned by TopKAggSpec); returns an
    * UNORDERED array. */
  def collect_top_k(e: Column, k: Int, reverse: Boolean): Column =
    call_function("collect_top_k", e, lit(k), lit(reverse))
}
