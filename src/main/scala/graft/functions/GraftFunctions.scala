package graft.functions

import org.apache.spark.sql.SparkSession

/** One-stop registration of the engine's custom Catalyst expressions.
  * Idempotent (createOrReplace); called from GraftSession.get() and
  * defensively from each operator entry point that uses them. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    SimHash64.register(spark)
    VectorExprs.register(spark)
    TextExprs.register(spark)
    TextHash.register(spark)
  }
}
