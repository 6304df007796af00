#!/usr/bin/env python3
"""Local oracle self-check mirroring the driver's DuckDB compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet written by graft.Verify, runs the matching
SQL from oracle_sql.json in DuckDB over the sf parquet tables, sorts columns
by name, sorts rows, canonicalizes floats, and diffs.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: round(v, 9) if isinstance(v, float) else v)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got_files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not got_files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            got = canon(pd.concat([pd.read_parquet(f) for f in got_files]))
            exp = canon(con.execute(sql).fetchdf())
            if list(got.columns) != list(exp.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
                n_fail += 1
                continue
            if len(got) != len(exp):
                print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
                n_fail += 1
                continue
            eq = got.astype(str).compare(exp.astype(str))
            if len(eq):
                print(f"FAIL {name}: {len(eq)} mismatched rows; first:\n{eq.head(3)}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
