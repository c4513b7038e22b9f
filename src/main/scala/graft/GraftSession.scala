package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Design notes for cluster scale (tested on local[32], designed for
  * 1000-executor clusters over ~100 TB):
  *   - AQE on: runtime coalescing of shuffle partitions, skew-join
  *     splitting (comment counts per docket span 0..25k+ in the
  *     reference corpus — see reference CONVERSION_READY.md:38-41).
  *   - shuffle.partitions is a *local* default (32); on a real cluster
  *     AQE's coalesce makes the initial number a ceiling, so deployments
  *     should raise `spark.sql.adaptive.coalescePartitions.initialPartitionNum`
  *     instead of hand-tuning per query.
  *   - UTC session timezone: oracle (DuckDB) parity for date bucketing.
  *   - maxPartitionBytes default 128m kept: the many-tiny-JSON-files
  *     ingest path (reference convert_to_iceberg.py:956-1121) relies on
  *     file-packing one task per ~128 MB of small files.
  *
  * `master` is only set when none was provided (so `spark-submit
  * --master` on a real cluster is respected); the cores env var is
  * validated to a positive int before it reaches any numeric conf.
  */
object GraftSession {

  /** SPARK_GRAFT_CPUS, validated; non-numeric or missing → 32. */
  def cores: Int =
    sys.env.get("SPARK_GRAFT_CPUS")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ > 0)
      .getOrElse(32)

  def builder(): SparkSession.Builder = {
    val n = cores
    // Keep catalog/metastore residue (spark-warehouse/, metastore_db/,
    // derby.log) under target/ instead of littering the working tree —
    // target/ is build output and gitignored.
    val target = new java.io.File("target").getAbsoluteFile
    target.mkdirs()
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file",
        new java.io.File(target, "derby.log").getPath)
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", target.getPath)
    val b = SparkSession
      .builder()
      .appName("graft")
      .config("spark.sql.warehouse.dir",
        new java.io.File(target, "spark-warehouse").toURI.toString)
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${new java.io.File(target, "metastore_db").getPath};create=true")
      .config("spark.sql.shuffle.partitions", n.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Respect the advisory partition size when coalescing instead of
      // maximizing parallelism: on small shuffles this collapses 32
      // few-KB partitions into one task (the dominant fixed cost per
      // query at small SF), and on a busy cluster it is the
      // documented-recommended setting for efficient utilization.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      // the events fixture carries parquet TIMESTAMP(NANOS) which Spark
      // rejects by default; read as long and convert in Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // fixture timestamps are parquet TIMESTAMP(MICROS,
      // isAdjustedToUTC=false); by default Spark 4 infers those as
      // TIMESTAMP_NTZ, which rejects epoch arithmetic (cast to bigint)
      // and diverges from the oracle's naive-UTC reading. Infer them as
      // session-tz TIMESTAMP instead (tz is pinned UTC above, so the
      // stored micros are identical) — at the reader, not via a
      // per-column cast, so ts predicates still push down to parquet.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // ObjectHashAggregate (collect_top_k / collect_list paths) falls
      // back to SORT-based aggregation after this many in-memory keys
      // per task — default 128, sized for unbounded collect buffers.
      // The engine's bounded heaps (collect_top_k in knnJoin /
      // hardNegatives: k entries per key) stay tiny per key, and the
      // fallback would resurrect exactly the full-partition sort the
      // aggregate exists to avoid, so allow more keys in memory.
      //
      // Sizing — the conf is session-wide, so it must be safe for the
      // WORST per-key state it governs, which is not the top-k heaps
      // (k structs ≈ 1 KB/key) but the unbounded collect_list document
      // buffers in LineDedup/SpanDedup reassembly (a full document per
      // key). 4096 keys/task bounds that path to ~40 MB/task at 10 KB
      // average documents (vs 640 MB at the earlier 65536 — a real
      // executor-OOM window at 100 TB corpus document sizes), while
      // still covering every knnJoin/hardNegatives probe batch up to
      // 4096 query vectors per map task with zero sort fallback.
      // Larger query batches degrade to the sort-based plan — slower,
      // never wrong — and should be chunked by the caller anyway (the
      // batch is broadcast, so it is bounded by driver memory first).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4096")
      .config("spark.ui.enabled", "false")
    if (sys.props.get("spark.master").isEmpty &&
      sys.env.get("MASTER").isEmpty) b.master(s"local[$n]") else b
  }

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Spark 4's WITH RECURSIVE materialization re-logs a known-benign
    // "output columns are expected to the same" warning from
    // LogicalRDD on every recursive step (attribute ids differ across
    // the loop's re-analysis; values are unaffected). At WARN it spams
    // hundreds of lines into bench/verify tails and would bury a real
    // warning — demote that one logger to ERROR.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.LogicalRDD",
      org.apache.logging.log4j.Level.ERROR)
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
