#!/usr/bin/env python3
"""Time-boxed sf0.1 oracle sweep for the exact-all-pairs rows.

The per-round correctness gate runs at sf0.01; the sf0.1 robustness
sweep (COVERAGE.md 5f) historically skipped the 8 queries whose DuckDB
oracles recompute exact all-pairs Jaccard (12.5M shingle-list pairs at
sf0.1) because their cost was unmeasured. This dev tool closes that:
it runs exactly those oracles against an existing Verify output dir,
each under a wall-clock budget, and records per-query PASS/FAIL/
TIMEOUT plus the measured oracle cost — so every remaining skip is a
documented measurement, not a guess.

Usage:
  python3 tools/sweep_allpairs_sf01.py <sfDir> <verifyOutDir> \
      [budget_sec_per_query]

Dev/driver-side tool only (same stack as check_correctness.py).
"""
import json
import multiprocessing as mp
import sys
import time

ALLPAIRS = [
    "dedup_minhash_lsh", "dedup_cross_source", "dedup_clusters",
    "dedup_threshold_sweep", "dedup_cluster_keep", "split_leakage_safe",
    "curate_audit", "pipeline_curate_split",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _run_oracle(sf_dir, sql, q):
    """Child process: run one oracle and ship the result back."""
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
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


def main(sf_dir, out_dir, budget_sec=900):
    import pandas as pd
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    for name in ALLPAIRS:
        sql = oracles.get(name)
        if sql is None:
            results[name] = ("NO-ORACLE", -1.0)
            continue
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
        m, o = normalize(mine), normalize(oracle)
        if list(m.columns) != list(o.columns):
            results[name] = (f"SCHEMA {list(m.columns)} vs {list(o.columns)}", dt)
        elif len(m) != len(o):
            results[name] = (f"ROWS {len(m)} vs {len(o)}", dt)
        else:
            try:
                pd.testing.assert_frame_equal(m, o, check_dtype=False,
                                              check_exact=True)
                results[name] = ("OK", dt)
            except AssertionError as e:
                results[name] = ("VALUES " + str(e).split("\n")[0][:120], dt)
        status, dt = results[name]
        print(f"{'PASS' if status == 'OK' else 'FAIL':4} {name}: "
              f"{status} ({dt:.1f}s oracle)", flush=True)
    n_ok = sum(1 for s, _ in results.values() if s == "OK")
    print(f"\n{n_ok}/{len(results)} all-pairs oracles match at sf0.1")
    print(json.dumps({k: {"status": s, "oracle_sec": round(t, 1)}
                      for k, (s, t) in results.items()}))
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 900
    sys.exit(main(sys.argv[1], sys.argv[2], budget))
