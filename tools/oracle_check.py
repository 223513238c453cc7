#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in DuckDB
over the same parquet tables, load the Spark result parquet, sort columns by
name, sort rows, and compare values exactly. Dev tool only (driver-side python).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"✗ {name}: column mismatch spark={list(g.columns)} duck={list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"✗ {name}: row count spark={len(g)} duck={len(w)}")
            n_fail += 1
        elif not g.equals(w):
            neq = (g != w).any(axis=1)
            print(f"✗ {name}: {neq.sum()} differing rows of {len(g)}")
            print("  spark:", g[neq].head(3).to_dict("records"))
            print("  duck :", w[neq].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"✓ {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
