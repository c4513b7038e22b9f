#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark; this uses the driver-side python
stack to pre-validate oracle parity before each round).

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    for name, sql in sorted(oracles.items()):
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            results[name] = f"NO-RESULT ({e})"
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-ERR ({e})"
            continue
        m, o = normalize(mine), normalize(oracle)
        if list(m.columns) != list(o.columns):
            results[name] = f"SCHEMA {list(m.columns)} vs {list(o.columns)}"
        elif len(m) != len(o):
            results[name] = f"ROWS {len(m)} vs {len(o)}"
        else:
            try:
                pd.testing.assert_frame_equal(m, o, check_dtype=False,
                                              check_exact=True)
                results[name] = "OK"
            except AssertionError as e:
                results[name] = "VALUES " + str(e).split("\n")[0][:120]
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' else 'FAIL':4} {name}: {v}")
    print(f"\n{n_ok}/{len(results)} oracle queries match")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
