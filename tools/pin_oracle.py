#!/usr/bin/env python3
"""Generate a pinned-constant DuckDB oracle (VALUES list) from a Verify
parquet output — the q44 pattern generalized. Used for the frozen contract
fixture queries (q45/q46), whose expected rows are literals by construction.

Usage: python3 tools/pin_oracle.py <verifyOutDir>/<query> col1,col2,... orderby1,orderby2,...
Prints the SQL on stdout (row order = the parquet's, which is the query's
ORDER BY; the emitted SQL re-ORDER-BYs the same keys).
"""
import sys, glob
import pandas as pd
import numpy as np


def lit(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, float):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def main():
    path, cols, order = sys.argv[1], sys.argv[2].split(","), sys.argv[3].split(",")
    files = sorted(glob.glob(f"{path}/*.parquet"))
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)[cols]
    df = df.astype(object).where(pd.notnull(df), None)
    rows = ",\n".join(
        "(" + ", ".join(lit(v) for v in rec) + ")" for rec in df.itertuples(index=False)
    )
    print(
        f"SELECT * FROM (VALUES\n{rows}\n) AS t({', '.join(cols)}) "
        f"ORDER BY {', '.join(order)}"
    )


if __name__ == "__main__":
    main()
