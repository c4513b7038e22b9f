#!/usr/bin/env python3
"""Compare two Bench JSON outputs (e.g. two BENCH_DETAIL.json files,
or the compact stdout lines): per-query delta, regressions flagged.
Dev tool for round-over-round tracking.

NOTE: the compact stdout line carries only the 14 headline queries —
full round-over-round coverage needs the BENCH_DETAIL.json files
(written beside the repo on every bench run). A driver BENCH_r{N}.json
whose line was truncated parses here only if the full "queries" map
survived; prefer the detail files.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [regression_factor]
"""
import json
import sys


def load(path):
    line = open(path).read()
    return json.loads(line[line.index("{"):])


def main(old_path, new_path, factor=1.5):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    regressions = []
    print(f"{'query':34} {'old':>8} {'new':>8} {'ratio':>6}")
    for name in sorted(set(oq) | set(nq)):
        o, n = oq.get(name), nq.get(name)
        if o is None or n is None or o <= 0 or n <= 0:
            print(f"{name:34} {o if o is not None else '-':>8} "
                  f"{n if n is not None else '-':>8}    new/gone")
            continue
        r = n / o
        flag = " <-- REGRESSION" if r > factor else ""
        if flag:
            regressions.append(name)
        print(f"{name:34} {o:8.2f} {n:8.2f} {r:6.2f}{flag}")
    print(f"\ntotal: {old['value']:.1f}s -> {new['value']:.1f}s; "
          f"{len(regressions)} regressions (> {factor}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 1.5))
