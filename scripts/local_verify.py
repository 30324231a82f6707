#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results (column-name-sorted, row-order-
insensitive value hashing)."""
import sys, json, glob, os
import duckdb
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

ok, bad = 0, 0
for qname in sorted(oracle):
    sql = oracle[qname]
    spark_path = f"{out_dir}/{qname}"
    if not os.path.isdir(spark_path):
        print(f"MISSING spark output: {qname}")
        bad += 1
        continue
    try:
        want = canon(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"ORACLE ERROR {qname}: {e}")
        bad += 1
        continue
    got = canon(con.execute(
        f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").fetchdf())
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA MISMATCH {qname}: spark={list(got.columns)} oracle={list(want.columns)}")
        bad += 1
        continue
    if len(got) != len(want):
        print(f"ROWS MISMATCH {qname}: spark={len(got)} oracle={len(want)}")
        bad += 1
        continue
    eq = got.astype(str).equals(want.astype(str))
    if not eq:
        print(f"VALUE MISMATCH {qname}")
        merged = got.astype(str).compare(want.astype(str))
        print(merged.head(5))
        bad += 1
    else:
        ok += 1

# rows-only queries (no oracle): check non-empty output exists
rows_only = [d for d in os.listdir(out_dir)
             if os.path.isdir(f"{out_dir}/{d}") and d not in oracle]
for qname in sorted(rows_only):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{qname}/*.parquet')").fetchone()[0]
    print(f"rows-only {qname}: {n} rows")

print(f"\nORACLE: {ok} ok, {bad} mismatched; rows-only: {len(rows_only)}")
sys.exit(1 if bad else 0)
