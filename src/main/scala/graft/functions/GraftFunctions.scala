package graft.functions

import org.apache.spark.sql.SparkSession

/** One-stop registration of the engine's custom Catalyst expressions.
  * Called from GraftSession.get() and defensively from each operator
  * entry point that uses them; registration runs once per SparkSession
  * (tracked in a weak set) so the defensive calls are free and don't
  * spam "function X replaced a previously registered function"
  * warnings into benchmark/test logs. */
object GraftFunctions {
  // Weak keys: sessions created by tests come and go; never pin them.
  private val registered: java.util.Set[SparkSession] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def register(spark: SparkSession): Unit = registerWith(spark, doRegister)

  /** The locking/membership discipline, with the registration body as
    * a seam so FunctionRegistrationSpec can pin it: membership flips
    * only AFTER the body completes, inside the lock — marking first
    * (the old `if (registered.add(spark))`) let a concurrent caller
    * return early and hit "undefined function minhash_bands" while the
    * first caller was still registering. */
  private[graft] def registerWith(
      spark: SparkSession,
      body: SparkSession => Unit): Unit = registered.synchronized {
    if (!registered.contains(spark)) {
      body(spark)
      registered.add(spark)
    }
  }

  private def doRegister(spark: SparkSession): Unit = {
    // Sessions built with spark.sql.extensions=graft.GraftExtensions
    // already have every EXPRESSION injected — re-registering them as
    // temp functions would only shadow the injected ones and log
    // "function X replaced" warnings. Probe one marker function.
    if (!spark.catalog.functionExists("minhash_bands")) {
      SimHash64.register(spark)
      VectorExprs.register(spark)
      TextExprs.register(spark)
      TextHash.register(spark)
      BloomExprs.register(spark)
      CountMinExprs.register(spark)
      TopKAgg.register(spark)
    }
  }
}
