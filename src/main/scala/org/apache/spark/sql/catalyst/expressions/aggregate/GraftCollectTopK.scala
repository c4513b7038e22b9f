package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Public doorway to Catalyst's package-private `CollectTopK`
  * (`private[aggregate]` in collect.scala) — the bounded-priority-
  * queue aggregate behind pandas-on-Spark's nlargest/nsmallest.
  * Spark hides it from the public registry; graft.functions.TopKAgg
  * registers it as `collect_top_k`. This file contains no logic —
  * just the cross-package constructor call scalac would otherwise
  * reject. */
object GraftCollectTopK {
  def apply(child: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(child, num, reverse)
}
