package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.maintain.Snapshots

/** Driver-facing rows for the snapshot/time-travel layer
  * ([[graft.maintain.Snapshots]]) — the table-format surface the
  * reference names ("iceberg") but never implements
  * (`iceberg_exploration.py:165-186` writes a plain parquet file).
  *
  * The snapshot table builds ONCE per fixture dir under `target/`
  * (immutable fixtures, the persisted-index lifecycle): v1 = the even
  * half of orders, v2 = append of the odd half. The query time-travels
  * to BOTH versions and aggregates each — so the oracle can re-derive
  * every number from the orders table with modulo predicates, proving
  * the retained version replays exactly and the append composed
  * losslessly. Commit machinery (atomic rename arbiter, race retry,
  * rollback, expire, orphan invisibility) is pinned in SnapshotsSpec.
  */
object SnapshotQueries {

  private def snapTable(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = "target/snap_orders_" +
      java.lang.Integer.toHexString(d.hashCode)
    // exactly (v1, v2) is the valid layout; anything else (absent,
    // half-built, or grown by a crashed earlier run) rebuilds
    if (Snapshots.versions(s, path) != Seq(1L, 2L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val orders = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      Snapshots.create(orders.filter(col("o_orderkey") % 2 === 0), path)
      Snapshots.commitAppend(orders.filter(col("o_orderkey") % 2 === 1), path)
    }
    path
  }

  /** snap_time_travel — both retained versions aggregated side by
    * side: v1 must replay the pre-append state bit-for-bit AFTER the
    * append landed. */
  val snapTimeTravel = Q(
    "snap_time_travel",
    (s, d) => {
      val path = snapTable(s, d)
      Seq(1L, 2L).map { v =>
        Snapshots.readVersion(s, path, v).agg(
            lit(v).cast("int").as("version"),
            count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).as("key_sum"),
            round(sum(col("o_totalprice")), 2).as("price_sum"))
      }.reduce(_.unionByName(_)).orderBy("version")
    },
    Some("""SELECT CAST(1 AS INT) AS version, COUNT(*) AS n_rows,
                   CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                   ROUND(SUM(o_totalprice), 2) AS price_sum
            FROM orders WHERE o_orderkey % 2 = 0
            UNION ALL
            SELECT CAST(2 AS INT), COUNT(*),
                   CAST(SUM(o_orderkey) AS BIGINT),
                   ROUND(SUM(o_totalprice), 2)
            FROM orders
            ORDER BY version"""))

  private def upsertTable(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = "target/snap_upsert_" +
      java.lang.Integer.toHexString(d.hashCode)
    if (Snapshots.versions(s, path) != Seq(1L, 2L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
      // v1: the even half, at original prices
      Snapshots.create(
        orders.filter(col("o_orderkey") % 2 === 0)
          .withColumn("ver", lit(1L)).withColumn("tb", lit(0L)),
        path)
      // v2: one MERGE carrying both an UPDATE (every %4==0 key gets
      // +100) and INSERTS (the odd half)
      val updates = orders.filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 100).as("o_totalprice"))
        .withColumn("ver", lit(2L)).withColumn("tb", lit(0L))
        .unionByName(
          orders.filter(col("o_orderkey") % 2 === 1)
            .withColumn("ver", lit(1L)).withColumn("tb", lit(0L)))
      Snapshots.commitUpsert(updates, path,
        keyCols = Seq("o_orderkey"), versionCol = "ver",
        tiebreakCol = "tb")
    }
    path
  }

  /** snap_upsert_merge — keyed MERGE as a version: the head must show
    * updates applied (latest `ver` wins) and inserts present, while
    * the PRE-MERGE version still replays at original prices — the
    * time-travelable-upsert contract in one row. */
  val snapUpsertMerge = Q(
    "snap_upsert_merge",
    (s, d) => {
      val path = upsertTable(s, d)
      Seq(1L, 2L).map { v =>
        Snapshots.readVersion(s, path, v).agg(
            lit(v).cast("int").as("version"),
            count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).as("key_sum"),
            round(sum(col("o_totalprice")), 2).as("price_sum"))
      }.reduce(_.unionByName(_)).orderBy("version")
    },
    Some("""SELECT CAST(1 AS INT) AS version, COUNT(*) AS n_rows,
                   CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                   ROUND(SUM(o_totalprice), 2) AS price_sum
            FROM orders WHERE o_orderkey % 2 = 0
            UNION ALL
            SELECT CAST(2 AS INT), COUNT(*),
                   CAST(SUM(o_orderkey) AS BIGINT),
                   ROUND(SUM(CASE WHEN o_orderkey % 4 = 0
                                  THEN o_totalprice + 100
                                  ELSE o_totalprice END), 2)
            FROM orders
            ORDER BY version"""))

  private def statsTable(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = "target/snap_stats_" +
      java.lang.Integer.toHexString(d.hashCode)
    if (Snapshots.versions(s, path) != Seq(1L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      // 8 range-partitioned files on the stat column: a mid-range
      // read must prune most of them from the manifest alone
      Snapshots.create(
        Tables.orders(s, d).select("o_orderkey", "o_totalprice")
          .repartitionByRange(8, col("o_orderkey")),
        path, statsCols = Seq("o_orderkey"))
    }
    path
  }

  /** snap_pruned_read — file-skipping time travel: the range
    * aggregate over [[Snapshots.readVersionWhere]]'s pruned file set
    * (plus the real predicate on top, the superset contract) must
    * equal DuckDB's plain range scan; `files_pruned` pins that the
    * manifest actually skipped files — a pruning regression flips it
    * to false and fails the hash. */
  val snapPrunedRead = Q(
    "snap_pruned_read",
    (s, d) => {
      val path = statsTable(s, d)
      val lo = 1000.0; val hi = 2000.0
      val pruned = Snapshots.readVersionWhere(
        s, path, 1L, "o_orderkey", lo, hi)
      val nFiles = pruned.inputFiles.length
      val total = Snapshots.readVersion(s, path, 1L).inputFiles.length
      pruned
        .filter(col("o_orderkey").between(lo, hi))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sum"),
          round(sum(col("o_totalprice")), 2).as("price_sum"),
          lit(nFiles < total).as("files_pruned"))
    },
    Some("""SELECT COUNT(*) AS n_rows,
                   CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                   ROUND(SUM(o_totalprice), 2) AS price_sum,
                   TRUE AS files_pruned
            FROM orders
            WHERE o_orderkey BETWEEN 1000 AND 2000"""))

  private def tsStatsTable(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = "target/snap_ts_stats_" +
      java.lang.Integer.toHexString(d.hashCode)
    if (Snapshots.versions(s, path) != Seq(1L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      // 8 time-range-clustered files: a half-year read must prune
      // most of them from the DATE-typed per-file stats alone
      Snapshots.create(
        Tables.orders(s, d)
          .select("o_orderkey", "o_orderdate", "o_totalprice")
          .repartitionByRange(8, col("o_orderdate")),
        path, statsCols = Seq("o_orderdate"))
    }
    path
  }

  /** snap_ts_pruned_read — TIME-RANGE file-skipping time travel: the
    * canonical lakehouse read (one window of a time-clustered table)
    * planned from DATE/TIMESTAMP per-file stats recorded in the
    * manifest's epoch-seconds domain ([[Snapshots.readVersionWhereTime]]
    * converts the ISO bounds through the SAME normalization the writer
    * used). The aggregate over the pruned files + residual predicate
    * must equal DuckDB's plain range scan; `files_pruned` pins that
    * the manifest actually skipped files. */
  val snapTsPrunedRead = Q(
    "snap_ts_pruned_read",
    (s, d) => {
      val path = tsStatsTable(s, d)
      val (lo, hi) = ("1995-01-01", "1995-06-30")
      val pruned = Snapshots.readVersionWhereTime(
        s, path, 1L, "o_orderdate", lo, hi)
      val nFiles = pruned.inputFiles.length
      val total = Snapshots.readVersion(s, path, 1L).inputFiles.length
      pruned
        .filter(col("o_orderdate").between(
          lit(lo).cast("timestamp"), lit(hi).cast("timestamp")))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sum"),
          round(sum(col("o_totalprice")), 2).as("price_sum"),
          lit(nFiles < total).as("files_pruned"))
    },
    Some("""SELECT COUNT(*) AS n_rows,
                   CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                   ROUND(SUM(o_totalprice), 2) AS price_sum,
                   TRUE AS files_pruned
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <= TIMESTAMP '1995-06-30'"""))

  /** The synthetic inserted row of the scoped-upsert table (key
    * chosen in scope 5 = 900000005 % 8, far above any fixture key). */
  private val InsKey = 900000005L
  private val InsPrice = 123.45

  private def scopedUpsertTable(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = "target/snap_scoped_" +
      java.lang.Integer.toHexString(d.hashCode)
    if (Snapshots.versions(s, path) != Seq(1L, 2L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      // scope = o_orderkey % 8: key-determined (the scoped-merge
      // contract) and range-clustered across 8 files so per-file
      // scope stats are disjoint
      def shaped(df: org.apache.spark.sql.DataFrame) = df.select(
        col("o_orderkey"), (col("o_orderkey") % 8).as("scope"),
        col("o_totalprice"))
      val orders = Tables.orders(s, d)
      Snapshots.create(
        shaped(orders).withColumn("ver", lit(1L)).withColumn("tb", lit(0L))
          .repartitionByRange(8, col("scope")),
        path, statsCols = Seq("scope"))
      // ONE scoped merge, every update in scope 5: UPDATE (+100 for
      // the %8==5 keys) and INSERT (a fresh key in scope 5)
      val updates = shaped(orders.filter(col("o_orderkey") % 8 === 5))
        .withColumn("o_totalprice", col("o_totalprice") + 100)
        .withColumn("ver", lit(2L)).withColumn("tb", lit(0L))
        .unionByName(
          s.range(1).select(
            lit(InsKey).as("o_orderkey"),
            lit(InsKey % 8).as("scope"),
            lit(InsPrice).as("o_totalprice"),
            lit(1L).as("ver"), lit(0L).as("tb")))
      Snapshots.commitUpsertScoped(updates, path,
        keyCols = Seq("o_orderkey"), versionCol = "ver",
        tiebreakCol = "tb", scopeCol = "scope")
    }
    path
  }

  /** snap_scoped_upsert — partition-scoped MERGE: the head shows the
    * scope-5 updates applied and the insert present while every other
    * scope's rows pass through BIT-UNTOUCHED — because their FILES
    * were never rewritten: `scope_pruned` pins (from the two
    * versions' planned file lists) that v1 files survived into v2
    * unchanged AND fewer than all were rewritten. A regression to the
    * full-table rewrite flips the pin and fails the hash. */
  val snapScopedUpsert = Q(
    "snap_scoped_upsert",
    (s, d) => {
      val path = scopedUpsertTable(s, d)
      val v1Files = Snapshots.readVersion(s, path, 1L).inputFiles.toSet
      val v2Files = Snapshots.readVersion(s, path, 2L).inputFiles.toSet
      val kept = (v1Files & v2Files).size
      val scoped = kept > 0 && kept < v1Files.size && v2Files.size > kept
      Seq(1L, 2L).map { v =>
        Snapshots.readVersion(s, path, v).agg(
            lit(v).cast("int").as("version"),
            count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).as("key_sum"),
            round(sum(col("o_totalprice")), 2).as("price_sum"),
            lit(scoped).as("scope_pruned"))
      }.reduce(_.unionByName(_)).orderBy("version")
    },
    Some(s"""SELECT CAST(1 AS INT) AS version, COUNT(*) AS n_rows,
                   CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                   ROUND(SUM(o_totalprice), 2) AS price_sum,
                   TRUE AS scope_pruned
            FROM orders
            UNION ALL
            SELECT CAST(2 AS INT), COUNT(*) + 1,
                   CAST(SUM(o_orderkey) + $InsKey AS BIGINT),
                   ROUND(SUM(CASE WHEN o_orderkey % 8 = 5
                                  THEN o_totalprice + 100
                                  ELSE o_totalprice END) + $InsPrice, 2),
                   TRUE
            FROM orders
            ORDER BY version"""))

  private def deleteTable(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = "target/snap_delete_" +
      java.lang.Integer.toHexString(d.hashCode)
    if (Snapshots.versions(s, path) != Seq(1L, 2L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      Snapshots.create(
        Tables.orders(s, d).select("o_orderkey", "o_totalprice")
          .repartitionByRange(8, col("o_orderkey")),
        path, statsCols = Seq("o_orderkey"))
      Snapshots.commitDeleteWhere(s, path, "o_orderkey", 1000, 2000)
    }
    path
  }

  /** snap_delete_where — range-scoped DELETE as a version: the head
    * must show exactly the [1000, 2000] keys gone while v1 still
    * replays them (erasure becomes durable only at expire — the
    * table-format contract); `files_kept` pins from the two versions'
    * planned file lists that only stat-overlapping files were
    * rewritten — a full-rewrite regression fails the hash. */
  val snapDeleteWhere = Q(
    "snap_delete_where",
    (s, d) => {
      val path = deleteTable(s, d)
      val v1Files = Snapshots.readVersion(s, path, 1L).inputFiles.toSet
      val v2Files = Snapshots.readVersion(s, path, 2L).inputFiles.toSet
      val kept = (v1Files & v2Files).size
      val scoped = kept > 0 && v2Files != v1Files
      Seq(1L, 2L).map { v =>
        Snapshots.readVersion(s, path, v).agg(
            lit(v).cast("int").as("version"),
            count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).as("key_sum"),
            round(sum(col("o_totalprice")), 2).as("price_sum"),
            lit(scoped).as("files_kept"))
      }.reduce(_.unionByName(_)).orderBy("version")
    },
    Some("""SELECT CAST(1 AS INT) AS version, COUNT(*) AS n_rows,
                   CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                   ROUND(SUM(o_totalprice), 2) AS price_sum,
                   TRUE AS files_kept
            FROM orders
            UNION ALL
            SELECT CAST(2 AS INT), COUNT(*),
                   CAST(SUM(o_orderkey) AS BIGINT),
                   ROUND(SUM(o_totalprice), 2),
                   TRUE
            FROM orders
            WHERE o_orderkey NOT BETWEEN 1000 AND 2000
            ORDER BY version"""))

  private def strStatsTable(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = "target/snap_str_stats_" +
      java.lang.Integer.toHexString(d.hashCode)
    if (Snapshots.versions(s, path) != Seq(1L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      // segment-clustered files: per-file STRING stats (truncated
      // UTF-8 bounds) are disjoint, so one segment's read prunes
      Snapshots.create(
        Tables.customer(s, d)
          .select("c_custkey", "c_mktsegment", "c_acctbal")
          .repartitionByRange(8, col("c_mktsegment")),
        path, statsCols = Seq("c_mktsegment"))
    }
    path
  }

  /** snap_str_pruned_read — STRING file-skipping: the reference's own
    * hottest access pattern (an agency-style equality filter,
    * `convert_to_iceberg.py:1172-1176`) planned from truncated UTF-8
    * per-file bounds in the manifest — no data scan to resolve the
    * file list. The aggregate over the pruned files + exact residual
    * must equal DuckDB's plain scan; `files_pruned` pins that files
    * were actually skipped — a string-stat regression fails the hash. */
  val snapStrPrunedRead = Q(
    "snap_str_pruned_read",
    (s, d) => {
      val path = strStatsTable(s, d)
      val seg = "BUILDING"
      val pruned = Snapshots.readVersionWhereStr(
        s, path, 1L, "c_mktsegment", seg, seg)
      val nFiles = pruned.inputFiles.length
      val total = Snapshots.readVersion(s, path, 1L).inputFiles.length
      pruned
        .filter(col("c_mktsegment") === seg)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("c_custkey")).as("key_sum"),
          round(sum(col("c_acctbal")), 2).as("bal_sum"),
          lit(nFiles < total).as("files_pruned"))
    },
    Some("""SELECT COUNT(*) AS n_rows,
                   CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
                   ROUND(SUM(c_acctbal), 2) AS bal_sum,
                   TRUE AS files_pruned
            FROM customer
            WHERE c_mktsegment = 'BUILDING'"""))

  /** The erased id list of the key-set-delete table — literal in both
    * engines (whether or not every key exists as a row, both sides
    * remove the same set). */
  private val DelKeys = Seq(1000L, 1001L, 1002L, 1003L, 1004L)

  private def deleteKeysTable(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = "target/snap_delkeys_" +
      java.lang.Integer.toHexString(d.hashCode)
    if (Snapshots.versions(s, path) != Seq(1L, 2L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      Snapshots.create(
        Tables.orders(s, d).select("o_orderkey", "o_totalprice")
          .repartitionByRange(8, col("o_orderkey")),
        path, statsCols = Seq("o_orderkey"))
      Snapshots.commitDeleteKeys(s, path, "o_orderkey",
        DelKeys.map(BigDecimal(_)))
    }
    path
  }

  /** snap_delete_keys — KEY-SET DELETE as a version (the
    * right-to-erasure shape: ids arrive as a list): the head shows
    * exactly the listed keys gone while v1 still replays them;
    * `files_kept` pins from the two versions' file lists that only
    * stat-hit files were rewritten — a full-rewrite regression fails
    * the hash. */
  val snapDeleteKeys = Q(
    "snap_delete_keys",
    (s, d) => {
      val path = deleteKeysTable(s, d)
      val v1Files = Snapshots.readVersion(s, path, 1L).inputFiles.toSet
      val v2Files = Snapshots.readVersion(s, path, 2L).inputFiles.toSet
      val kept = (v1Files & v2Files).size
      val scoped = kept > 0 && v2Files != v1Files
      Seq(1L, 2L).map { v =>
        Snapshots.readVersion(s, path, v).agg(
            lit(v).cast("int").as("version"),
            count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).as("key_sum"),
            round(sum(col("o_totalprice")), 2).as("price_sum"),
            lit(scoped).as("files_kept"))
      }.reduce(_.unionByName(_)).orderBy("version")
    },
    Some(s"""SELECT CAST(1 AS INT) AS version, COUNT(*) AS n_rows,
                   CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                   ROUND(SUM(o_totalprice), 2) AS price_sum,
                   TRUE AS files_kept
            FROM orders
            UNION ALL
            SELECT CAST(2 AS INT), COUNT(*),
                   CAST(SUM(o_orderkey) AS BIGINT),
                   ROUND(SUM(o_totalprice), 2),
                   TRUE
            FROM orders
            WHERE o_orderkey NOT IN (${DelKeys.mkString(", ")})
            ORDER BY version"""))

  /** The looked-up id list of the bloom table — literal in both
    * engines. */
  private val LookupKeys = Seq(1000L, 2000L, 3000L)

  private def bloomTable(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = "target/snap_bloom_" +
      java.lang.Integer.toHexString(d.hashCode)
    if (Snapshots.versions(s, path) != Seq(1L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      // hash-shuffled — every file spans the key range, so min/max
      // stats are recorded but CANNOT exclude a file; only the
      // per-file blooms can
      Snapshots.create(
        Tables.orders(s, d).select("o_orderkey", "o_totalprice")
          .repartition(8),
        path, statsCols = Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
    }
    path
  }

  /** snap_key_lookup — BLOOM file-skipping on an UNCLUSTERED layout:
    * the point-lookup/erasure-audit shape (ids arrive as a list) where
    * range stats are useless by construction (hash-shuffled files all
    * span the key space). `files_pruned` therefore pins that the
    * per-file BLOOM membership sketches did the skipping — a bloom
    * regression (or a silent fallback to ranges) fails the hash. The
    * aggregate over the pruned files + exact residual IN must equal
    * DuckDB's plain scan. */
  val snapKeyLookup = Q(
    "snap_key_lookup",
    (s, d) => {
      val path = bloomTable(s, d)
      val pruned = Snapshots.readVersionWhereKeys(
        s, path, 1L, "o_orderkey", LookupKeys.map(BigDecimal(_)))
      val nFiles = pruned.inputFiles.length
      val total = Snapshots.readVersion(s, path, 1L).inputFiles.length
      pruned
        .filter(col("o_orderkey").isin(LookupKeys: _*))
        .agg(
          count(lit(1)).as("n_rows"),
          coalesce(sum(col("o_orderkey")), lit(0L)).as("key_sum"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2)
            .as("price_sum"),
          lit(nFiles < total).as("files_pruned"))
    },
    Some(s"""SELECT COUNT(*) AS n_rows,
                   CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT) AS key_sum,
                   ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS price_sum,
                   TRUE AS files_pruned
            FROM orders
            WHERE o_orderkey IN (${LookupKeys.mkString(", ")})"""))

  /** The planted inserted row of the change-feed table (a key far
    * above any fixture key, in no delete range). */
  private val CdfInsKey = 900000011L
  private val CdfInsPrice = 55.5

  private def changeFeedTable(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = "target/snap_cdf_" +
      java.lang.Integer.toHexString(d.hashCode)
    if (Snapshots.versions(s, path) != Seq(1L, 2L, 3L, 4L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      def shaped(df: org.apache.spark.sql.DataFrame, ver: Long) = df
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("ver", lit(ver)).withColumn("tb", lit(0L))
      val orders = Tables.orders(s, d)
      // v1 create = even keys; v2 append = odd keys
      Snapshots.create(
        shaped(orders.filter(col("o_orderkey") % 2 === 0), 1L), path)
      Snapshots.commitAppend(
        shaped(orders.filter(col("o_orderkey") % 2 === 1), 1L), path)
      // v3 = one MERGE: update every %4==0 key (+100) and insert one
      // fresh key
      val ups = shaped(orders.filter(col("o_orderkey") % 4 === 0), 2L)
        .withColumn("o_totalprice", col("o_totalprice") + 100)
        .unionByName(s.range(1).select(
          lit(CdfInsKey).as("o_orderkey"),
          lit(CdfInsPrice).as("o_totalprice"),
          lit(1L).as("ver"), lit(0L).as("tb")))
      Snapshots.commitUpsert(ups, path, keyCols = Seq("o_orderkey"),
        versionCol = "ver", tiebreakCol = "tb")
      // v4 = range DELETE of the [1000, 2000] keys
      Snapshots.commitDeleteWhere(s, path, "o_orderkey", 1000, 2000)
    }
    path
  }

  /** snap_change_feed — the ROW-level CDC read across REWRITES
    * ([[Snapshots.readChangeFeed]], the Delta-CDF shape the
    * append-only `readAppendedBetween` refuses): one window over
    * create+append+MERGE+DELETE commits must label every change —
    * appends as inserts, the merge's churn as key-classified
    * update_preimage/update_postimage pairs (carried-verbatim rows
    * cancelling in the multiset diff) plus its fresh key as an
    * insert, and the range delete's rows (at their post-merge prices)
    * as deletes — every cell re-derived by DuckDB from the orders
    * table with the same modulo/range predicates. */
  val snapChangeFeed = Q(
    "snap_change_feed",
    (s, d) => {
      val path = changeFeedTable(s, d)
      Snapshots.readChangeFeed(s, path, 0L, 4L,
        keyCols = Seq("o_orderkey"))
        .groupBy(
          col(Snapshots.CommitVersionCol).cast("int").as("version"),
          col(Snapshots.ChangeTypeCol).as("change_type"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sum"),
          round(sum(col("o_totalprice")), 2).as("price_sum"))
        .orderBy("version", "change_type")
    },
    Some(s"""SELECT CAST(1 AS INT) AS version, 'insert' AS change_type,
                   COUNT(*) AS n_rows,
                   CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                   ROUND(SUM(o_totalprice), 2) AS price_sum
            FROM orders WHERE o_orderkey % 2 = 0
            UNION ALL
            SELECT CAST(2 AS INT), 'insert', COUNT(*),
                   CAST(SUM(o_orderkey) AS BIGINT),
                   ROUND(SUM(o_totalprice), 2)
            FROM orders WHERE o_orderkey % 2 = 1
            UNION ALL
            SELECT CAST(3 AS INT), 'insert', CAST(1 AS BIGINT),
                   CAST($CdfInsKey AS BIGINT), $CdfInsPrice
            UNION ALL
            SELECT CAST(3 AS INT), 'update_preimage', COUNT(*),
                   CAST(SUM(o_orderkey) AS BIGINT),
                   ROUND(SUM(o_totalprice), 2)
            FROM orders WHERE o_orderkey % 4 = 0
            UNION ALL
            SELECT CAST(3 AS INT), 'update_postimage', COUNT(*),
                   CAST(SUM(o_orderkey) AS BIGINT),
                   ROUND(SUM(o_totalprice + 100), 2)
            FROM orders WHERE o_orderkey % 4 = 0
            UNION ALL
            SELECT CAST(4 AS INT), 'delete', COUNT(*),
                   CAST(SUM(o_orderkey) AS BIGINT),
                   ROUND(SUM(CASE WHEN o_orderkey % 4 = 0
                                  THEN o_totalprice + 100
                                  ELSE o_totalprice END), 2)
            FROM orders WHERE o_orderkey BETWEEN 1000 AND 2000
            ORDER BY version, change_type"""))

  private def cdcDocsTable(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = "target/snap_cdc_docs_" +
      java.lang.Integer.toHexString(d.hashCode)
    if (Snapshots.versions(s, path) != Seq(1L, 2L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val reference = docs.filter(col("doc_id") % 2 === 0)
      // v1 = the frozen reference corpus; v2 = one appended batch of
      // incoming docs (odd ids + 10 planted exact copies, re-id'd) —
      // the same corpus split `dedup_incremental` uses, arriving
      // through the versioned table instead of a parquet path
      Snapshots.create(reference, path)
      Snapshots.commitAppend(
        docs.filter(col("doc_id") % 2 === 1).unionByName(
          reference.filter(col("doc_id") < 20)
            .withColumn("doc_id", col("doc_id") + 1000000L)),
        path)
    }
    path
  }

  /** pipeline_cdc_dedup — the snapshot layer FEEDING the LLM pipeline:
    * a downstream dedup consumer tails the corpus table with the
    * manifest-diff CDC read (`readAppendedBetween` plans ONLY the
    * appended files — metadata-resolved, no table re-read) and
    * onboards exactly that delta against the version-pinned reference
    * (`readVersion(1)` — immune to the append by construction). The
    * delta ≡ `dedup_incremental`'s incoming batch and v1 ≡ its frozen
    * reference, so that row's full DuckDB re-derivation (exact drops
    * by text equality, near drops by exact cross-corpus Jaccard)
    * applies VERBATIM — pinning both the CDC read's exactness and the
    * dedup composition in one row. */
  val pipelineCdcDedup = Q(
    "pipeline_cdc_dedup",
    (s, d) => {
      val path = cdcDocsTable(s, d)
      graft.llm.Dedup.incrementalDedupAudit(
        Snapshots.readAppendedBetween(s, path, 1L, 2L),
        Snapshots.readVersion(s, path, 1L))
    },
    graft.llm.LlmQueries.dedupIncremental.oracle)

  /** The erased document ids — literal in both engines. */
  private val ErasedIds = Seq(0L, 2L, 4L, 6L, 8L)

  private def cdfErasureTable(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = "target/snap_cdf_erase_" +
      java.lang.Integer.toHexString(d.hashCode)
    if (Snapshots.versions(s, path) != Seq(1L, 2L)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      // v1 = the reference corpus (id-clustered, id stats recorded so
      // the erasure rewrite is file-scoped); v2 = one erasure request
      Snapshots.create(
        Tables.documents(s, d).select("doc_id", "text")
          .filter(col("doc_id") % 2 === 0)
          .repartitionByRange(8, col("doc_id")),
        path, statsCols = Seq("doc_id"))
      Snapshots.commitDeleteKeys(s, path, "doc_id",
        ErasedIds.map(BigDecimal(_)))
    }
    path
  }

  /** pipeline_cdf_erasure — right-to-erasure PROPAGATING to a derived
    * pipeline artifact through the change feed: an erasure request
    * lands as a key-set DELETE commit on the corpus table; the dedup
    * consumer maintains its frozen reference by applying the feed's
    * delete rows (anti-join — it never re-reads the table), and the
    * next incoming batch dedups against THAT. Planted copies of the
    * erased docs must now SURVIVE the exact phase (their source is
    * gone — dropping them would resurrect erased content as evidence)
    * unless a near-dup of a surviving doc catches them; every count
    * is re-derived by DuckDB from the documents table with the
    * erased-id list inlined, and `n_erased` pins that the feed served
    * exactly the erasure's rows. */
  val pipelineCdfErasure = Q(
    "pipeline_cdf_erasure",
    (s, d) => {
      val path = cdfErasureTable(s, d)
      val feed = Snapshots.readChangeFeed(s, path, 1L, 2L)
      val erased = feed
        .filter(col(Snapshots.ChangeTypeCol) === Snapshots.ChangeDelete)
        .select("doc_id")
      val nErased = erased.count()
      val refNow = Snapshots.readVersion(s, path, 1L)
        .join(erased, Seq("doc_id"), "left_anti")
      val docs = Tables.documents(s, d)
      val planted = docs
        .filter(col("doc_id") % 2 === 0 && col("doc_id") < 20)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val incoming = docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
        .unionByName(planted.select("doc_id", "text"))
      graft.llm.Dedup.incrementalDedupAudit(incoming, refNow)
        .withColumn("n_erased", lit(nErased))
    },
    Some(s"""WITH ref AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id % 2 = 0
                AND doc_id NOT IN (${ErasedIds.mkString(", ")})),
            inc AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text FROM documents
              WHERE doc_id % 2 = 0 AND doc_id < 20),
            surv AS (
              SELECT i.doc_id, i.text FROM inc i
              WHERE NOT EXISTS (
                SELECT 1 FROM ref r WHERE r.text = i.text)),
            ish AS (
              SELECT doc_id,
                CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) < 3
                  THEN [array_to_string(string_split_regex(lower(trim(text)), '\\s+'), ' ')]
                  ELSE list_distinct([array_to_string(string_split_regex(lower(trim(text)), '\\s+')[i:i+2], ' ')
                        for i in range(1, len(string_split_regex(lower(trim(text)), '\\s+')) - 1)])
                END AS sh
              FROM surv),
            rsh AS (
              SELECT doc_id,
                CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) < 3
                  THEN [array_to_string(string_split_regex(lower(trim(text)), '\\s+'), ' ')]
                  ELSE list_distinct([array_to_string(string_split_regex(lower(trim(text)), '\\s+')[i:i+2], ' ')
                        for i in range(1, len(string_split_regex(lower(trim(text)), '\\s+')) - 1)])
                END AS sh
              FROM ref),
            near AS (
              SELECT DISTINCT a.doc_id FROM ish a JOIN rsh b ON
                ROUND(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0
                    THEN 0.0
                    ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                         CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)
                  END, 4) >= 0.5)
            SELECT (SELECT COUNT(*) FROM inc) AS n_incoming,
                   (SELECT COUNT(*) FROM inc)
                     - (SELECT COUNT(*) FROM surv) AS n_exact_dropped,
                   (SELECT COUNT(*) FROM near) AS n_near_dropped,
                   (SELECT COUNT(*) FROM surv)
                     - (SELECT COUNT(*) FROM near) AS n_kept,
                   (SELECT COUNT(*) FROM documents
                    WHERE doc_id % 2 = 0
                      AND doc_id IN (${ErasedIds.mkString(", ")}))
                     AS n_erased"""))

  def all: Seq[Q] = Seq(snapTimeTravel, snapUpsertMerge, snapPrunedRead,
    snapTsPrunedRead, snapStrPrunedRead, snapScopedUpsert,
    snapDeleteWhere, snapDeleteKeys, snapKeyLookup, snapChangeFeed,
    pipelineCdcDedup, pipelineCdfErasure)
}
