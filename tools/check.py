#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query dumped by
graft.Verify (outDir/<name>/ parquet + outDir/oracle_sql.json), run the
oracle SQL in DuckDB over the sf-dir parquet tables and compare row count,
column names, and sorted values. Usage: check.py <sfDir> <outDir> [names...]
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        spark_df = pq.read_table(files).to_pandas()
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_bad += 1
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}")
            n_bad += 1
            continue
        s = spark_df[s_cols].sort_values(s_cols).reset_index(drop=True)
        d = duck_df[d_cols].sort_values(d_cols).reset_index(drop=True)
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_bad += 1
            continue
        try:
            d = d.astype(s.dtypes.to_dict())
        except Exception:
            pass
        neq = (s != d)
        # NaN == NaN for our purposes
        import pandas as pd
        neq &= ~(s.isna() & d.isna())
        if neq.any().any():
            bad_cols = [c for c in s_cols if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            print(f"FAIL {name}: value mismatch cols={bad_cols} "
                  f"first row {i}: spark={s.loc[i].to_dict()} duck={d.loc[i].to_dict()}")
            n_bad += 1
            continue
        print(f"OK   {name}: {len(s)} rows")
        n_ok += 1
    print(f"== {n_ok} ok / {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
