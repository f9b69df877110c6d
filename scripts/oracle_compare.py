"""Dev-side replica of the round driver's DuckDB correctness gate.

Usage:  python3 scripts/oracle_compare.py <verify_out_dir> <sf_dir>

<verify_out_dir> is what `runMain graft.Verify <sf_dir> <out>` wrote: one
parquet dir per registered query plus oracle_sql.json. Each oracle SQL runs
in DuckDB over views of the sf dir's tables; rows and columns are sorted and
compared as strings, mirroring the driver's hash compare. (Driver-side
python deps only — this script is tooling, not part of the shipped library.)
"""
import duckdb, json, glob, os, sys
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['documents', 'embeddings', 'lineitem', 'orders', 'customer',
          'events', 'nation', 'region', 'part', 'supplier']:
    # a table is a single file in the driver's testdata but a Spark
    # part-file DIRECTORY in the scale fixtures — glob accordingly
    path = f'{sfdir}/{t}.parquet'
    if os.path.isdir(path):
        path = f'{path}/*.parquet'
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    spark_df = (pd.concat([pd.read_parquet(f) for f in files],
                          ignore_index=True) if files else None)
    try:
        ora = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fails += 1; continue
    if spark_df is None:
        print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
    a, b = canon(spark_df), canon(ora)
    if list(a.columns) != list(b.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(a.columns)} "
              f"oracle={list(b.columns)}"); fails += 1; continue
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT {len(a)} vs {len(b)}"); fails += 1; continue
    eq = a.astype(str).equals(b.astype(str))
    if not eq:
        fails += 1
    print(f"{name}: {'MATCH' if eq else 'VALUE MISMATCH'} ({len(a)} rows)")
print("FAILS:", fails)
