#!/usr/bin/env python3
"""Local facsimile of the driver's correctness gate.

Usage: python3 scripts/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the sf_dir
parquet tables, and compares: row count, column-name set, and a hash of
the values with columns sorted by name and rows sorted canonically.
This mirrors the driver's CORRECTNESS_r{N}.json check so parity bugs
surface locally before the round boundary.
"""
import glob
import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    # Driver-faithful: the round gate sorts rows with pandas sort_values
    # over all columns, which raises TypeError on unhashable cells
    # (numpy arrays from ArrayType/MapType output columns). Replicate
    # that so non-hashable outputs fail HERE, not at the round boundary.
    cols = sorted(df.columns)
    df = df.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = ["\x01".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return hashlib.sha256("\x02".join(rows).encode()).hexdigest()[:16]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        elif canon(got) != canon(want):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            if "value hash mismatch" in problems and len(got) == len(want):
                cols = sorted(got.columns)
                g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
                w = want.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
                for i in range(min(len(g), 5000)):
                    if canon(g.iloc[[i]]) != canon(w.iloc[[i]]):
                        print("  first diff row", i)
                        print("  spark :", g.iloc[i].to_dict())
                        print("  duckdb:", w.iloc[i].to_dict())
                        break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # queries without oracle: rows-only report
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle:
            files = glob.glob(os.path.join(out_dir, d, "*.parquet"))
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            status = "ok" if n > 0 else "EMPTY"
            print(f"ROWS-ONLY {d}: {n} rows [{status}]")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
