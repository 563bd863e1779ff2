#!/usr/bin/env python3
"""Strict dev-only replica of the driver's hash-level correctness gate.

Round-1 lesson (ADVICE.md): tools/check_oracle.py read BOTH sides through
duckdb.fetchdf(), which floats-ifies DECIMAL columns identically on both
sides — so decimal renderings that differ between a pandas read of the
Spark parquet (Decimal objects) and a duckdb fetch of the oracle (float64)
passed locally but failed the driver's hash gate. This checker reproduces
the driver's stricter path:

  spark side:  pandas.read_parquet  (pyarrow types: Decimal, arrays, ...)
  oracle side: duckdb .df()
  then: sort columns by name, df.sort_values(by=all columns) — which, like
  the driver, CRASHES on array-typed columns (unhashable numpy.ndarray) —
  then exact per-value comparison of (type, str(value)).

Usage: python3 tools/check_strict.py <sfDir> <verifyOutDir> [name ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    return (type(v).__name__, str(v))


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    # no thread cap: round 10 reworked the x88/x89 oracle stacks (norm
    # precompute + MATERIALIZED shared CTEs) so every oracle runs in
    # <~2s standalone at DuckDB's default thread count (r10-close
    # measurement: slowest x94 2.0s — the recursive-CC family; total
    # ~20s, no memory-heavy stacks) — the checker now mirrors
    # the driver's defaults exactly
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    unknown = (only or set()) - set(oracles)
    if unknown:
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        return 1
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle errored: {e}")
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_bad += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
            continue
        try:
            # the driver sorts rows before hashing; this is the call that
            # dies on numpy.ndarray cells
            exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
            got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: sort crashed (array column?): {type(e).__name__}: {e}")
            n_bad += 1
            continue
        mism = []
        for c in exp.columns:
            for i, (a, b) in enumerate(zip(exp[c].tolist(), got[c].tolist())):
                if canon(a) != canon(b):
                    mism.append((c, i, canon(a), canon(b)))
                    if len(mism) > 3:
                        break
            if len(mism) > 3:
                break
        if mism:
            print(f"FAIL {name}: value/type mismatches {mism[:3]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
    checked = len(only) if only else len(oracles)
    print(f"\n{checked - n_bad}/{checked} strict-checked queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
