#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir>

Reads each <outDir>/<name> parquet dir (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, sorts columns by name + rows by all columns,
and hash-compares the value matrix (mirrors the driver's described
compare: column-name sort → value hash).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes to comparable strings
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)
    df = df.sort_values(by=list(df.columns), na_position="first",
                        key=lambda s: s.map(cell)).reset_index(drop=True)
    return df.map(cell)

fails = 0
for name in sorted(oracle):
    spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_glob:
        print(f"MISS  {name}: no spark output"); fails += 1; continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet({spark_glob!r})").fetchdf()
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"ORAERR {name}: {e}"); fails += 1; continue
    a, b = canon(sdf), canon(odf)
    if list(a.columns) != list(b.columns):
        print(f"SCHEMA {name}: spark={list(a.columns)} oracle={list(b.columns)}")
        fails += 1; continue
    if len(a) != len(b):
        print(f"ROWS  {name}: spark={len(a)} oracle={len(b)}"); fails += 1; continue
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        print(f"HASH  {name}: {int(diff.sum())}/{len(a)} rows differ; first:")
        i = diff.idxmax()
        print("  spark :", a.loc[i].to_dict())
        print("  oracle:", b.loc[i].to_dict())
        fails += 1; continue
    print(f"OK    {name} ({len(a)} rows)")
print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'} "
      f"({len(oracle)} queries with oracle)")
sys.exit(1 if fails else 0)
