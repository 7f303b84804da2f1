#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same testdata parquet, and
compares: columns sorted by name, rows sorted by all columns, exact value
equality (with float bit-tolerance reporting so rounding gaps are visible
before they become hash mismatches).

Usage: local_verify.py <sfDir> <verifyOutDir> [--skip q_a,q_b,...]

--skip downgrades the named queries to rows-only for THIS run — used by
the sf1 scale rehearsal, where a handful of DuckDB oracle twins are
deliberately quadratic (all-pairs / recursive-closure SQL) and need
hours at 50k docs while the Spark side is prefix-filtered/banded and
finishes in seconds. Those queries stay hash-checked at the scales
where the quadratic oracle is feasible (sf0.01 by the driver, sf0.1 by
the rehearsal).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for sort/compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            import datetime
            if len(df) and isinstance(df[c].iloc[0], datetime.date):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    # sort by exact-typed columns first so a float mismatch doesn't
    # cascade into row-alignment noise
    order = ([c for c in df.columns if df[c].dtype.kind != "f"] +
             [c for c in df.columns if df[c].dtype.kind == "f"])
    df = df.sort_values(by=order, kind="mergesort").reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"FAIL cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"FAIL rows spark={len(a)} duck={len(b)}"
    issues = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = (~eq).sum()
                maxdiff = (av - bv).abs().max()
                issues.append(f"{c}: {bad} float diffs (max {maxdiff})")
        else:
            avs = av.astype(object).where(~av.isna(), None)
            bvs = bv.astype(object).where(~bv.isna(), None)
            neq = [i for i in range(len(avs)) if avs[i] != bvs[i]]
            if neq:
                i = neq[0]
                issues.append(f"{c}: {len(neq)} diffs e.g. row {i}: {avs[i]!r} != {bvs[i]!r}")
    return "OK" if not issues else "FAIL " + "; ".join(issues)


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    import glob
    produced = sorted(
        d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json"))
    for name in produced:
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"{name:28s} FAIL spark output unreadable: {e}")
            continue
        if name in skip:
            print(f"{name:28s} rows-only (oracle skipped): {len(spark_df)} rows")
            n_ok += 1
            continue
        if name not in oracle:
            print(f"{name:28s} rows-only: {len(spark_df)} rows")
            n_ok += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:28s} FAIL oracle sql error: {e}")
            continue
        r = compare(name, spark_df, duck_df)
        if r == "OK":
            n_ok += 1
            print(f"{name:28s} OK ({len(spark_df)} rows)")
        else:
            print(f"{name:28s} {r}")
    missing = [k for k in oracle if k not in produced]
    if missing:
        print(f"MISSING spark outputs: {missing}")
    print(f"== {n_ok}/{len(produced)} pass")


if __name__ == "__main__":
    skip = ()
    args = sys.argv[1:]
    if "--skip" in args:
        i = args.index("--skip")
        skip = tuple(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    main(args[0], args[1], skip)
