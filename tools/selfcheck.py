#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's parquet
result against its DuckDB oracle over the same test tables.

Usage: python3 tools/selfcheck.py <sfDir> <outDir>
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable, engine-agnostic compare (driver hashes values)
    df = df.astype(object).where(pd.notnull(df), None)

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.applymap(cell)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    # a query that threw during planning writes no result dir — that must
    # FAIL, not silently skip (the oracle key proves it was declared)
    present = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracle) - present):
        print(f"[FAIL-run] {name}: declared oracle but no result written")
        failures += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL-ora] {name}: oracle SQL error: {str(e)[:200]}")
            failures += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL-col] {name}: spark={list(g.columns)} oracle={list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"[FAIL-cnt] {name}: spark={len(g)} oracle={len(e)}")
            failures += 1
            continue
        if not g.equals(e):
            neq = (g != e).any(axis=1)
            print(f"[FAIL-val] {name}: {int(neq.sum())}/{len(g)} rows differ; first diffs:")
            print(pd.concat([g[neq].head(3).add_suffix("_spark"),
                             e[neq].head(3).add_suffix("_oracle")], axis=1).to_string())
            failures += 1
            continue
        print(f"[PASS] {name}: {len(g)} rows")
    print(f"=> {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
