#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
named after the tables in <sfDir>. Compares schema (column names),
row count, and cell values (columns sorted by name, rows in emitted
order, NaN-safe, float tolerance 0 — we require exact equality since
both sides round explicitly).
"""
import sys, json, glob, math, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    return df

def cells_equal(a, b):
    if a is None and b is None: return True
    try:
        # NaT (and other pandas NA scalars) compare unequal to themselves
        if pd.isna(a) and pd.isna(b): return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d): continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"; continue
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if name not in oracle:
            results[name] = f"NO_ORACLE rows={len(spark_df)}"; continue
        try:
            duck_df = norm(con.execute(oracle[name]).df())
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {str(e)[:200]}"; continue
        if list(spark_df.columns) != list(duck_df.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(spark_df.columns)} duck={list(duck_df.columns)}"
            continue
        if len(spark_df) != len(duck_df):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(spark_df)} duck={len(duck_df)}"
            continue
        sv, dv = spark_df.values.tolist(), duck_df.values.tolist()
        bad = None
        for i, (ra, rb) in enumerate(zip(sv, dv)):
            for j, (a, b) in enumerate(zip(ra, rb)):
                if not cells_equal(a, b):
                    bad = (i, spark_df.columns[j], a, b); break
            if bad: break
        results[name] = "OK" if bad is None else f"VALUE_MISMATCH row={bad[0]} col={bad[1]} spark={bad[2]!r} duck={bad[3]!r}"
    width = max(len(k) for k in results) if results else 0
    n_ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        print(f"{k:<{width}}  {v}")
    print(f"-- {n_ok}/{len(results)} OK")
    sys.exit(0 if all(v == "OK" or v.startswith("NO_ORACLE") for v in results.values()) else 1)

if __name__ == "__main__":
    main()
