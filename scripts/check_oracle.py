#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query in oracle_sql.json: run the SQL in DuckDB over the
parquet tables in sfDir, load the Spark result parquet, sort columns by
name, sort rows, compare values and dtypes. NOT part of the library —
mirrors the external gate so oracle-SQL dialect bugs surface early.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize: lists -> tuples for sortability
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list,)) else v)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        w, g = norm(want), norm(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns differ: duckdb={list(w.columns)} spark={list(g.columns)}")
            n_fail += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows differ: duckdb={len(w)} spark={len(g)}")
            n_fail += 1
            continue
        mismatch = []
        for c in w.columns:
            wv, gv = w[c], g[c]
            if str(wv.dtype) != str(gv.dtype):
                mismatch.append(f"dtype[{c}]: duckdb={wv.dtype} spark={gv.dtype}")
            # float columns: last-ulp cross-engine drift is not a failure
            if str(wv.dtype).startswith("float") and str(gv.dtype).startswith("float"):
                import numpy as np
                eq = pd.Series(np.isclose(wv, gv, rtol=1e-9, equal_nan=True))
            else:
                eq = (wv == gv) | (wv.isna() & gv.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                mismatch.append(f"value[{c}] row {bad}: duckdb={wv[bad]!r} spark={gv[bad]!r}")
        if mismatch:
            print(f"FAIL {name}: " + "; ".join(mismatch[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(w)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracle queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
