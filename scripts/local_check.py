#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 scripts/local_check.py <sfDir> <verifyOutDir>

For each query dir in verifyOutDir: read the Spark parquet result; if the
query has oracle SQL in oracle_sql.json, run it in DuckDB over views of
the sfDir parquet tables; sort columns by name, sort rows, compare
values; print MATCH/MISMATCH per query.
"""
import json, sys, glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types: timestamps -> str, floats -> rounded repr
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                type(v).__name__ == "ndarray" else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True) \
        if len(df.columns) else df
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/q_*")):
        name = qdir.split("/")[-1]
        try:
            spark_df = pd.concat([pd.read_parquet(p) for p in
                                  sorted(glob.glob(f"{qdir}/*.parquet"))],
                                 ignore_index=True)
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(spark_df)} rows)" + \
                (" EMPTY!" if len(spark_df) == 0 else "")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {e}"
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"COLS-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWS-MISMATCH spark={len(a)} duck={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=False, rtol=0, atol=0)
                results[name] = "MATCH"
            except AssertionError as e:
                results[name] = "VALUES-MISMATCH " + str(e).replace("\n", " | ")[:300]
    bad = 0
    for name, r in sorted(results.items()):
        flag = "OK " if r == "MATCH" or r.startswith("rows-only (") and "EMPTY" not in r else "BAD"
        if flag == "BAD":
            bad += 1
        print(f"[{flag}] {name}: {r}")
    print(f"\n{len(results)} queries, {bad} problems")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
