package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The ONE `private[sql]` doorway the engine needs: LogicalPlan →
  * DataFrame, for the v1 streaming Source's `getBatch` contract
  * (MicroBatchExecution asserts the returned frame has
  * `isStreaming = true`, a plan property no public constructor sets).
  * Spark's own pre-DSv2 connectors live inside `org.apache.spark.sql.*`
  * subpackages for exactly this access (e.g. `sql.kafka010`'s v1
  * source); this shim keeps the repo's use of it to one documented
  * line instead of scattering `asInstanceOf`/reflection through the
  * streaming code. Nothing else in the repo may import from here
  * except [[graft.streaming]].
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
