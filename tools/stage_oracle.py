#!/usr/bin/env python3
"""Resource-bounded STAGED replay of a heavyweight DuckDB oracle
(VERDICT r12 #5: retrieval_hybrid_rrf spilled DuckDB past disk at sf1,
stream_ann_ingest OOM-killed the checker — both embed the full IVFADC
training+search CTE chain, whose one-query materialization peak grows
with corpus^2-ish intermediates even though every STAGE output is
small).

Mechanism: split the oracle's top-level WITH list (paren/string-aware),
then materialize a configurable subset of CTEs to parquet one stage at
a time — each stage runs in its own DuckDB pass with a memory limit and
sees earlier stages as `name AS (SELECT * FROM read_parquet(...))`.
Any staged subset is sound because CTEs only reference earlier CTEs and
every CTE is a deterministic SET (window functions inside carry total
orders). The final pass runs the remaining chain + the outer SELECT and
hash-compares against the Spark output with the same canonicalization
as tools/check.py.

Usage:
  python3 tools/stage_oracle.py <outDir> <sfDir> <name> [--stages n1,n2]
          [--mem 8GB] [--keep]

<outDir> is a graft.Verify output dir (spark parquet per query +
oracle_sql.json). Default stage set covers the IVFADC chain's round
boundaries; names not present in the query are ignored.
"""
import sys, os, json, glob, shutil, tempfile
import duckdb
import pandas as pd

# default stage points: each k-means assignment/update round, the code
# assignment, the probe/candidate steps, and the BM25 postings chain —
# the peak of any single stage is one round's join, never the chain
DEFAULT_STAGES = [
    "sub", "subtr", "a1", "u1", "c1", "a2", "u2", "c2", "codes",
    "vv", "vvtr", "va1", "vu1", "vc1", "va2", "vu2", "vc2",
    "scored", "ranked", "cells", "qprobes", "recon", "adc", "top", "rer",
    "toks", "tf", "dfreq", "q", "contrib", "bmscored", "bmranked",
    "dsranked",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def split_ctes(sql):
    """-> ([(name, body)], final_select). Top-level split of WITH list."""
    s = sql.strip()
    assert s.upper().startswith("WITH"), "oracle has no WITH chain"
    s = s[4:]
    ctes, i, n = [], 0, len(s)

    def skip_ws(i):
        while i < n and s[i].isspace():
            i += 1
        return i

    while True:
        i = skip_ws(i)
        j = i
        while j < n and (s[j].isalnum() or s[j] == '_'):
            j += 1
        name = s[i:j]
        j = skip_ws(j)
        assert s[j:j + 2].upper() == "AS", f"expected AS after CTE {name!r}"
        j = skip_ws(j + 2)
        assert s[j] == '(', f"expected ( after {name} AS"
        depth, k, in_str = 0, j, False
        while k < n:
            c = s[k]
            if in_str:
                if c == "'":
                    if k + 1 < n and s[k + 1] == "'":
                        k += 1
                    else:
                        in_str = False
            elif c == "'":
                in_str = True
            elif c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
                if depth == 0:
                    break
            k += 1
        ctes.append((name, s[j + 1:k]))
        k = skip_ws(k + 1)
        if k < n and s[k] == ',':
            i = k + 1
        else:
            return ctes, s[k:]


def connect(mem, tmpdir, sf_dir):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{tmpdir}/duck_spill'")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}')")
    return con


def with_clause(defs):
    return "WITH " + ",\n".join(f"{n} AS ({b})" for n, b in defs)


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)

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


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) if "=" in a else (a[2:], "1")
                for a in sys.argv[1:] if a.startswith("--"))
    out_dir, sf_dir, name = args
    stages = opts.get("stages", ",".join(DEFAULT_STAGES)).split(",")
    mem = opts.get("mem", "8GB")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    ctes, final = split_ctes(oracle)
    tmpdir = tempfile.mkdtemp(prefix=f"stage_{name}_")
    staged = {}  # cte name -> parquet path
    try:
        def defs_upto(k):
            """All defs for CTEs ctes[0..k], staged ones substituted."""
            return [(n, f"SELECT * FROM read_parquet('{staged[n]}')"
                     if n in staged else b)
                    for n, b in ctes[:k + 1]]

        for idx, (cte_name, body) in enumerate(ctes):
            if cte_name not in stages:
                continue
            path = f"{tmpdir}/{cte_name}.parquet"
            con = connect(mem, tmpdir, sf_dir)
            con.execute(f"COPY ({with_clause(defs_upto(idx))} SELECT * "
                        f"FROM {cte_name}) TO '{path}' (FORMAT parquet)")
            con.close()
            shutil.rmtree(f"{tmpdir}/duck_spill", ignore_errors=True)
            staged[cte_name] = path
            print(f"[stage] {cte_name}: "
                  f"{os.path.getsize(path) / 1e6:.1f} MB", flush=True)
        defs = defs_upto(len(ctes) - 1)
        con = connect(mem, tmpdir, sf_dir)
        odf = con.execute(f"{with_clause(defs)} {final}").fetchdf()
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        sdf = con.execute(
            f"SELECT * FROM read_parquet({spark_glob!r})").fetchdf()
        con.close()
        a, b = canon(sdf), canon(odf)
        if list(a.columns) != list(b.columns):
            print(f"SCHEMA {name}: spark={list(a.columns)} "
                  f"oracle={list(b.columns)}"); sys.exit(1)
        if len(a) != len(b):
            print(f"ROWS  {name}: spark={len(a)} oracle={len(b)}")
            sys.exit(1)
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"HASH  {name}: {int(diff.sum())}/{len(a)} rows differ")
            print(pd.concat([a[diff].head(3), b[diff].head(3)]))
            sys.exit(1)
        print(f"OK    {name} ({len(a)} rows, staged "
              f"{len(staged)} CTEs)")
    finally:
        if "keep" not in opts:
            shutil.rmtree(tmpdir, ignore_errors=True)
        else:
            print(f"[stage] kept {tmpdir}")


if __name__ == "__main__":
    main()
