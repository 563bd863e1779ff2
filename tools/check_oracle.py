#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate.

NOT part of the engine (the engine is Scala/Spark only): this replays the
driver's DuckDB-oracle compare locally so oracle mismatches surface before
a round ends. Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir>

after `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"`.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # no thread cap: round 10 reworked the x88/x89 oracle stacks (norm
    # precompute + MATERIALIZED shared CTEs) so every oracle runs in
    # <~2s standalone at DuckDB's default thread count (r10-close
    # measurement: slowest x94 2.0s — the recursive-CC family; total
    # ~20s, no memory-heavy stacks) — the checker now mirrors
    # the driver's defaults exactly
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle errored: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
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
        # order-insensitive compare, like the driver's gate (it row-sorts
        # both sides before hashing): Spark-side queries only ORDER BY
        # where it is semantic (top-k), so produced order may differ
        try:
            exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
            got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: sort crashed (array column?): {e}")
            n_bad += 1
            continue
        mism = []
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if str(a) != str(b):
                    mism.append((c, i, a, b))
                    if len(mism) > 3:
                        break
            if len(mism) > 3:
                break
        if mism:
            print(f"FAIL {name}: value mismatches {mism[:3]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
    print(f"\n{len(oracles) - n_bad}/{len(oracles)} oracled queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
