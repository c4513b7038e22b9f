#!/usr/bin/env python3
"""Time-boxed sf0.1 oracle sweep for the exact-all-pairs rows.

The per-round correctness gate runs at sf0.01; the sf0.1 robustness
sweep (COVERAGE.md 5f) historically skipped the 8 queries whose DuckDB
oracles recompute exact all-pairs Jaccard because the naive nested-loop
formulation (12.5M list-pair evaluations at sf0.1) exceeds 9 minutes
PER QUERY (measured: a single all-pairs oracle did not finish a 560 s
budget on 32 threads). This tool closes the sweep with an
ALGEBRAICALLY EQUIVALENT exact formulation:

    explode shingle sets -> equi-join on shingle -> per-pair
    intersection counts -> |A∩B| / (|A| + |B| - |A∩B|)

which enumerates exactly the pairs with non-empty intersection (every
other pair has Jaccard 0, below every threshold used) and computes the
identical double division the naive CTE computes. NOT an
approximation: same pairs, same Jaccard, same tails — only the join
strategy differs (sparse equi-join instead of O(n²) nested loop).

Trust is established, not assumed: before the sf0.1 run, every fast
oracle is executed at sf0.01 next to its canonical naive twin from
the Verify dump and must match frame-exactly; any divergence fails
the sweep. The canonical oracle strings in SparkEntry are untouched —
the sf0.01 gate still runs the naive form.

Usage:
  python3 tools/sweep_allpairs_sf01.py <sf01Dir> <verifyOutDir> \
      [budget_sec_per_query] [sf001Dir]

Dev/driver-side tool only (same stack as check_correctness.py).
"""
import json
import multiprocessing as mp
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# shared fragments -----------------------------------------------------

SH = r"""sh AS (
  SELECT doc_id,
    CASE WHEN len(string_split_regex(lower(trim(text)), '\s+')) < 3
      THEN [array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' ')]
      ELSE list_distinct([array_to_string(string_split_regex(lower(trim(text)), '\s+')[i:i+2], ' ')
            for i in range(1, len(string_split_regex(lower(trim(text)), '\s+')) - 1)])
    END AS s
  FROM {src})"""

# exact Jaccard via sparse equi-join; j is the UNROUNDED double the
# naive CASE computes (callers round where their canonical twin rounds)
FAST_JAC = r"""ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
card AS (SELECT doc_id, len(s) AS c FROM sh),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_int
          FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
jac AS (SELECT id_a, id_b,
               CAST(n_int AS DOUBLE) / (ca.c + cb.c - n_int) AS j
        FROM inter JOIN card ca ON ca.doc_id = inter.id_a
                   JOIN card cb ON cb.doc_id = inter.id_b)"""

# min-label connected components over the >=0.5 pair graph (tail copied
# verbatim from the canonical recursive oracles)
CLUSTER_WALK = r"""prs AS (SELECT id_a, id_b FROM jac WHERE j >= 0.5),
edges AS (
  SELECT id_a AS u, id_b AS v FROM prs
  UNION ALL SELECT id_b, id_a FROM prs),
nds AS (SELECT DISTINCT u AS id FROM edges),
walk(id, reach) AS (
  SELECT id, id FROM nds
  UNION
  SELECT e.v, w.reach FROM walk w JOIN edges e ON e.u = w.id),
lbl AS (SELECT id, MIN(reach) AS cluster FROM walk GROUP BY id)"""

SH_DOCS = SH.format(src="documents")

# exact-dedup keep + shingles over the kept set (curate pipelines)
DK = r"""keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
dk AS (
  SELECT d.doc_id, d.text FROM documents d SEMI JOIN keep USING (doc_id))"""

FAST_ORACLES = {
    "dedup_minhash_lsh": f"""WITH {SH_DOCS},
{FAST_JAC}
SELECT COUNT(*) AS n_pairs,
       COALESCE(ROUND(AVG(ROUND(j, 4)), 4), 0.0) AS avg_jaccard
FROM jac WHERE ROUND(j, 4) >= 0.5""",

    "dedup_cross_source": f"""WITH {SH_DOCS},
{FAST_JAC}
SELECT least(da.source, db.source) AS source_x,
       greatest(da.source, db.source) AS source_y,
       COUNT(*) AS n_pairs,
       CAST(ROUND(SUM(ROUND(j, 4)) * 10000) AS BIGINT) AS jaccard_sum_e4
FROM jac JOIN documents da ON da.doc_id = id_a
         JOIN documents db ON db.doc_id = id_b
WHERE ROUND(j, 4) >= 0.5
GROUP BY 1, 2 ORDER BY source_x, source_y""",

    "dedup_threshold_sweep": f"""WITH {SH_DOCS},
{FAST_JAC}
SELECT COUNT(CASE WHEN ROUND(j,4) >= 0.5 THEN 1 END) AS ge_050,
       COUNT(CASE WHEN ROUND(j,4) >= 0.6 THEN 1 END) AS ge_060,
       COUNT(CASE WHEN ROUND(j,4) >= 0.7 THEN 1 END) AS ge_070,
       COUNT(CASE WHEN ROUND(j,4) >= 0.8 THEN 1 END) AS ge_080,
       COUNT(CASE WHEN ROUND(j,4) >= 0.9 THEN 1 END) AS ge_090
FROM jac""",

    "dedup_clusters": f"""WITH RECURSIVE {SH_DOCS},
{FAST_JAC},
{CLUSTER_WALK},
cl AS (SELECT cluster, COUNT(*) AS sz FROM lbl GROUP BY cluster)
SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       COUNT(*) AS n_clusters,
       CAST(COALESCE(SUM(sz), 0) AS BIGINT) AS n_clustered_docs,
       CAST(COALESCE(MAX(sz), 0) AS BIGINT) AS max_cluster
FROM cl""",

    "dedup_cluster_keep": f"""WITH RECURSIVE {SH_DOCS},
{FAST_JAC},
{CLUSTER_WALK},
kept AS (
  SELECT doc_id FROM documents
  WHERE doc_id NOT IN (SELECT id FROM lbl WHERE id <> cluster))
SELECT COUNT(*) AS n_kept, MIN(doc_id) AS min_id,
       MAX(doc_id) AS max_id,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM kept""",

    "split_leakage_safe": f"""WITH RECURSIVE {SH_DOCS},
{FAST_JAC},
{CLUSTER_WALK},
keyed AS (
  SELECT d.doc_id, l.cluster,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split_regex(CAST(coalesce(l.cluster, d.doc_id) AS VARCHAR), ''),
                            c -> CAST(ascii(c) AS BIGINT))),
           (acc, x) -> (acc * 131 + x) % 2147483647)
           % 100 AS b
  FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id)
SELECT CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       COUNT(cluster) AS n_clustered_docs
FROM keyed GROUP BY 1 ORDER BY split""",

    "curate_audit": f"""WITH {DK},
{SH.format(src="dk")},
{FAST_JAC},
drops AS (SELECT DISTINCT id_b AS doc_id FROM jac WHERE j >= 0.85),
near AS (SELECT dk.doc_id, dk.text FROM dk ANTI JOIN drops USING (doc_id)),
q AS (
  SELECT doc_id FROM (
    SELECT doc_id, text,
      ROUND(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
        t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t))) AS DOUBLE)
        / GREATEST(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE), 1.0), 4) AS stop_ratio,
      ROUND(CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
        / GREATEST(CAST(length(text) AS DOUBLE), 1.0), 4) AS punct_ratio
    FROM near)
  WHERE length(text) >= 20
    AND ROUND((LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
         + (1.0 - LEAST(punct_ratio * 5.0, 1.0))
         + LEAST(stop_ratio * 5.0, 1.0)) / 3.0, 4) >= 0.25)
SELECT stage, n_docs FROM (
  SELECT 'input' AS stage, (SELECT COUNT(*) FROM documents) AS n_docs
  UNION ALL
  SELECT 'after_exact_dedup', (SELECT COUNT(*) FROM dk)
  UNION ALL
  SELECT 'curated', (SELECT COUNT(*) FROM q))
ORDER BY n_docs DESC, stage""",

    "pipeline_curate_split": f"""WITH {DK},
{SH.format(src="dk")},
{FAST_JAC},
drops AS (SELECT DISTINCT id_b AS doc_id FROM jac WHERE j >= 0.85),
near AS (SELECT dk.doc_id, dk.text FROM dk ANTI JOIN drops USING (doc_id)),
toks AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\\s+') AS t
  FROM near),
hits AS (
  SELECT *,
    CAST(len(list_filter(t, x -> list_contains(
      ['der','die','und','das','von','zu','mit','den','ein','ist'], x))) AS BIGINT) AS h_de,
    CAST(len(list_filter(t, x -> list_contains(
      ['the','a','of','and','to','in','is','that','it','for'], x))) AS BIGINT) AS h_en,
    CAST(len(list_filter(t, x -> list_contains(
      ['el','la','de','que','y','en','un','los','se','por'], x))) AS BIGINT) AS h_es,
    CAST(len(list_filter(t, x -> list_contains(
      ['le','la','de','et','les','des','un','une','du','que'], x))) AS BIGINT) AS h_fr,
    CAST(len(list_filter(t, x -> list_contains(
      ['的','一','是','不','了','人','我','在','有','他'], x))) AS BIGINT) AS h_zh
  FROM toks),
scored AS (
  SELECT doc_id,
    ROUND((LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
      + (1.0 - LEAST(ROUND(CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
          AS DOUBLE) / GREATEST(CAST(length(text) AS DOUBLE), 1.0), 4) * 5.0, 1.0))
      + LEAST(ROUND(h_en / GREATEST(CAST(len(t) AS DOUBLE), 1.0), 4) * 5.0, 1.0))
      / 3.0, 4) AS quality,
    CASE WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr
              AND h_de >= h_zh THEN 'de'
         WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
         WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
         WHEN h_fr >= h_zh THEN 'fr'
         ELSE 'zh' END AS lang_pred,
    list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split_regex(CAST(doc_id AS VARCHAR), ''),
                       c -> CAST(ascii(c) AS BIGINT))),
      (acc, x) -> (acc * 131 + x) % 2147483647) % 100 AS b,
    length(text) AS n_chars
  FROM hits)
SELECT CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split,
       lang_pred,
       COUNT(*) AS n_docs,
       ROUND(AVG(quality), 4) AS avg_quality
FROM scored
WHERE n_chars >= 20 AND quality >= 0.25
GROUP BY 1, 2 ORDER BY split, lang_pred""",
}


def _connect(sf_dir):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _run_oracle(sf_dir, sql, q):
    """Child process: run one oracle and ship the result back."""
    con = _connect(sf_dir)
    t0 = time.perf_counter()
    df = con.execute(sql).fetchdf()
    q.put((time.perf_counter() - t0, df))


def normalize(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def frames_equal(m, o):
    import pandas as pd
    if list(m.columns) != list(o.columns):
        return f"SCHEMA {list(m.columns)} vs {list(o.columns)}"
    if len(m) != len(o):
        return f"ROWS {len(m)} vs {len(o)}"
    try:
        pd.testing.assert_frame_equal(m, o, check_dtype=False,
                                      check_exact=True)
        return "OK"
    except AssertionError as e:
        return "VALUES " + str(e).split("\n")[0][:120]


def validate_fast_oracles(sf001_dir, oracles):
    """At sf0.01, fast formulation must equal the canonical naive one."""
    con = _connect(sf001_dir)
    ok = True
    for name, fast in FAST_ORACLES.items():
        naive = oracles.get(name)
        if naive is None:
            print(f"VALIDATE {name}: no canonical oracle in dump", flush=True)
            ok = False
            continue
        a = normalize(con.execute(naive).fetchdf())
        b = normalize(con.execute(fast).fetchdf())
        status = frames_equal(b, a)
        print(f"VALIDATE {name}: {status}", flush=True)
        ok = ok and status == "OK"
    return ok


def main(sf_dir, out_dir, budget_sec=900, sf001_dir="/root/testdata/sf0.01"):
    import pandas as pd
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    if not validate_fast_oracles(sf001_dir, oracles):
        print("fast-oracle validation FAILED at sf0.01 — aborting sweep")
        return 1

    results = {}
    for name, sql in FAST_ORACLES.items():
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            results[name] = (f"NO-RESULT ({e})", -1.0)
            continue
        # run the oracle in a child so a blown budget is killable
        q = mp.Queue()
        p = mp.Process(target=_run_oracle, args=(sf_dir, sql, q))
        t0 = time.perf_counter()
        p.start()
        p.join(budget_sec)
        if p.is_alive():
            p.terminate()
            p.join()
            results[name] = ("TIMEOUT", time.perf_counter() - t0)
            print(f"TIMEOUT {name}: > {budget_sec}s budget", flush=True)
            continue
        try:
            dt, oracle = q.get_nowait()
        except Exception:
            results[name] = ("ORACLE-ERR (child died)", -1.0)
            continue
        status = frames_equal(normalize(mine), normalize(oracle))
        results[name] = (status, dt)
        print(f"{'PASS' if status == 'OK' else 'FAIL':4} {name}: "
              f"{status} ({dt:.1f}s oracle)", flush=True)
    n_ok = sum(1 for s, _ in results.values() if s == "OK")
    print(f"\n{n_ok}/{len(results)} all-pairs oracles match at sf0.1")
    print(json.dumps({k: {"status": s, "oracle_sec": round(t, 1)}
                      for k, (s, t) in results.items()}))
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 900
    sf001 = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"
    sys.exit(main(sys.argv[1], sys.argv[2], budget, sf001))
