#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with the
sfDir tables registered as views, and compares: column names (sorted),
dtypes (loose), row multiset (exact values after sorting).
"""
import json, sys, pathlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    out = pathlib.Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if pathlib.Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = out / name
        if not qdir.exists():
            print(f"[MISS] {name}: no Verify output")
            n_fail += 1
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            n_fail += 1
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"[FAIL] {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"[FAIL] {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"[PASS] {name}: {len(a)} rows")
            n_pass += 1
        except AssertionError as e:
            print(f"[FAIL] {name}: value mismatch\n{str(e)[:500]}")
            # show first differing rows
            diff = (a != b) & ~(a.isna() & b.isna())
            rows = diff.any(axis=1)
            if rows.any():
                i = rows.idxmax()
                print("  spark:", a.loc[i].to_dict())
                print("  duck :", b.loc[i].to_dict())
            n_fail += 1
    print(f"\n{n_pass} PASS, {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
