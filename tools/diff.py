#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL and compare values.

Usage: python3 tools/diff.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def norm(df):
    df = df[sorted(df.columns)]
    # normalize for comparison: stringify everything at full precision
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: repr(v))
    return out

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"MISSING  {name} (no spark output)"); n_bad += 1; continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {str(e)[:200]}"); n_bad += 1; continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"COLS     {name}: spark={list(a.columns)} duck={list(b.columns)}")
            n_bad += 1; continue
        if len(a) != len(b):
            print(f"ROWS     {name}: spark={len(a)} duck={len(b)}"); n_bad += 1; continue
        # driver sorts columns by name; compare row-order-sensitively first,
        # then sorted as fallback info
        if a.equals(b):
            print(f"OK       {name} ({len(a)} rows)"); n_ok += 1; continue
        a2 = a.sort_values(by=list(a.columns)).reset_index(drop=True)
        b2 = b.sort_values(by=list(b.columns)).reset_index(drop=True)
        if a2.equals(b2):
            print(f"OK-UNORD {name} ({len(a)} rows; row order differs)"); n_ok += 1
            continue
        n_bad += 1
        neq = (a2 != b2)
        bad_cols = [c for c in a2.columns if neq[c].any()]
        print(f"DIFF     {name}: cols {bad_cols}")
        for c in bad_cols[:3]:
            idx = neq[c].idxmax()
            print(f"  [{c}] row {idx}: spark={a2[c][idx]} duck={b2[c][idx]}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
