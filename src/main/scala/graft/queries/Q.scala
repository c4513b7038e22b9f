package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query with an optional DuckDB oracle.
  *
  * `run` is the Spark-native implementation (DataFrame/Dataset API so
  * Catalyst sees a declarative plan — pushdown, pruning, broadcast all
  * apply). `oracle` is ANSI SQL executable by DuckDB over the same
  * parquet tables; column names/aliases MUST match the Spark result
  * exactly (the driver's compare sorts columns by name before hashing).
  * Queries whose semantics are not SQL-expressible (LSH bucketing,
  * streaming state) leave `oracle = None` → driver records a
  * rows-only check; their correctness is covered by ScalaTest instead.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Aggregates every query module into the single driver-facing map. */
object Registry {
  def all: Seq[Q] =
    CoreQueries.all ++
      JoinQueries.all ++
      WindowQueries.all ++
      ProfileQueries.all ++
      SqlQueries.all ++
      SkewQueries.all ++
      AdvancedQueries.all ++
      ExtendedQueries.all ++
      IngestQueries.all ++
      SnapshotQueries.all ++
      graft.llm.LlmQueries.all ++
      graft.streaming.StreamQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
