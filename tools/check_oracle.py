#!/usr/bin/env python3
"""Local dev replica of the driver's correctness gate: run graft.Verify
(written parquet per query + oracle_sql.json), execute each oracle in
DuckDB over the same sf tables, and compare rows/schema/values.

Usage: python3 tools/check_oracle.py <outDir> <sfDir> [query ...]

This is a development tool only — the shipped Scala library has no
Python dependency.
"""
import json, math, sys
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def compare(name, spark_df, duck_df):
    problems = []
    if list(sorted(spark_df.columns)) != list(sorted(duck_df.columns)):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = canon(spark_df), canon(duck_df)
    n = min(len(a), len(b))
    for col in a.columns:
        av, bv = a[col].values[:n], b[col].values[:n]
        for i in range(n):
            x, y = av[i], bv[i]
            if x is None or (isinstance(x, float) and math.isnan(x)):
                ok = y is None or (isinstance(y, float) and math.isnan(y)) or pd.isna(y)
            elif isinstance(x, float) and isinstance(y, float):
                ok = x == y or (math.isnan(x) and math.isnan(y))
            else:
                ok = str(x) == str(y)
            if not ok:
                problems.append(f"col {col} row {i}: spark={x!r} duck={y!r}")
                break
    return problems

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            duck = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            spark = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output: {e}")
            n_bad += 1
            continue
        problems = compare(name, spark, duck)
        if problems:
            n_bad += 1
            print(f"FAIL {name}: " + "; ".join(problems[:4]))
        else:
            n_ok += 1
            print(f"ok   {name} ({len(spark)} rows)")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
