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


import re


def _canon_type(t):
    """Canonicalize DuckDB type names to the equivalence the DRIVER's hash
    empirically uses (calibrated against CORRECTNESS_r01.json):

    - integer widths are interchangeable (TINYINT..BIGINT all hashed as
      ints — 13 round-1 queries had INTEGER vs BIGINT drift and passed);
    - DECIMAL and FLOAT/DOUBLE are interchangeable (both render as floats
      in pandas — q_histogram DOUBLE vs DECIMAL(25,1) passed);
    - int-family vs float-family FAILS ("100" vs "100.0" — q_math_fns);
    - HUGEINT FAILS vs int-family (pandas converts int128 to float64 —
      q_lang_stats, q_seq_pack).
    """
    if t is None:
        return None
    t = str(t)
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    if t in ("FLOAT", "DOUBLE") or re.fullmatch(r"DECIMAL\(\d+,\d+\)", t):
        return "FLOAT"
    return t.replace("STRING", "VARCHAR").replace("TEXT", "VARCHAR")


def main(outdir: str, sfdir: str) -> int:
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixtures are single files; tools/Amplify writes Spark
        # directory-tables — glob those (r15, the x10 scale ledger)
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
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
        # Dtype parity at the DuckDB level (BEFORE pandas normalization):
        # the driver's hash is type-sensitive, so DuckDB HUGEINT/DOUBLE vs
        # Spark BIGINT must fail here even when values compare equal.
        mt = dict(zip(*con.execute(
            "SELECT column_name, column_type FROM (DESCRIBE SELECT * FROM "
            f"read_parquet('{outdir}/{name}/*.parquet'))").fetchnumpy().values()))
        rt = dict(zip(*con.execute(
            f"SELECT column_name, column_type FROM (DESCRIBE ({sql}))"
        ).fetchnumpy().values()))
        dt_bad = [(c, mt.get(c), rt.get(c)) for c in mine.columns
                  if _canon_type(mt.get(c)) != _canon_type(rt.get(c))]
        if dt_bad:
            c, a, b = dt_bad[0]
            print(f"FAIL {name}: dtype drift on {len(dt_bad)} col(s); first: "
                  f"col={c} spark={a} oracle={b}")
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
