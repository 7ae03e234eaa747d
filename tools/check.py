#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/*.parquet written by graft.Verify, runs the paired
oracle SQL from <out>/oracle_sql.json in DuckDB against the same sf tables,
sorts columns by name (mirroring the driver), and compares shape + values.
Exit code 1 if any query mismatches.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(outdir: str, sfdir: str) -> int:
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            ref = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        mine = mine[sorted(mine.columns)]
        ref = ref[sorted(ref.columns)]
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(ref.columns)}")
            n_fail += 1
            continue
        if mine.shape != ref.shape:
            print(f"FAIL {name}: shape {mine.shape} != {ref.shape}")
            n_fail += 1
            continue
        bad_cols = []
        for c in mine.columns:
            a, b = mine[c], ref[c]
            try:
                import pandas as pd
                eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
                if not eq.all():
                    i = int((~eq).argmax())
                    bad_cols.append((c, i, a.iloc[i], b.iloc[i]))
            except Exception as e:
                bad_cols.append((c, -1, "cmp-error", str(e)))
        if bad_cols:
            c, i, av, bv = bad_cols[0]
            print(f"FAIL {name}: {len(bad_cols)} col(s) differ; first: "
                  f"col={c} row={i} spark={av!r} oracle={bv!r}")
            n_fail += 1
        else:
            print(f"OK   {name}: {mine.shape[0]} rows x {mine.shape[1]} cols")
    print(f"\n{len(oracle) - n_fail}/{len(oracle)} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
