#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark; SURVEY.md §5).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet result dumped by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB against the
parquet tables in <sf_dir>, and compares: column names (sorted), dtypes,
row count, and values (rows sorted by all columns)."""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).map(
                lambda v: str(pd.Timestamp(v)) if pd.notna(v) else None)
        elif df[c].dtype == object:
            # normalize date vs timestamp-at-midnight to one string form
            df[c] = df[c].map(
                lambda v: str(pd.Timestamp(v))
                if isinstance(v, (datetime.date, datetime.datetime))
                else (str(v) if v is not None else None))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    import glob
    # glob skips the dot-prefixed .failed dir; .json artifacts excluded
    names = sorted(p.split("/")[-1] for p in glob.glob(f"{out_dir}/*")
                   if not p.endswith(".json"))
    for name in names:
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            # empty result for an oracle-less operator is a regression,
            # not a skip — it must fail the exit code
            if len(got) > 0:
                n_skip += 1
                print(f"{'SKIP(no-oracle)':18s} {name} rows={len(got)}")
            else:
                n_fail += 1
                print(f"{'FAIL(empty)':18s} {name} rows=0")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"FAIL(oracle-err)   {name}: {e}")
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            n_fail += 1
            print(f"FAIL(cols)         {name}: spark={list(g.columns)} "
                  f"duckdb={list(e.columns)}")
            continue
        if len(g) != len(e):
            n_fail += 1
            print(f"FAIL(rows)         {name}: spark={len(g)} duckdb={len(e)}")
            continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                x = None if (isinstance(x, float) and math.isnan(x)) else x
                y = None if (isinstance(y, float) and math.isnan(y)) else y
                if not values_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            n_fail += 1
            c, i, x, y = bad
            print(f"FAIL(value)        {name}: col={c} row={i} "
                  f"spark={x!r} ({type(x).__name__}) duckdb={y!r} "
                  f"({type(y).__name__})")
        else:
            # dtype drift is a warning: driver may hash dtypes strictly
            dt = [(c, str(g[c].dtype), str(e[c].dtype))
                  for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
            n_pass += 1
            note = f" dtype-drift={dt}" if dt else ""
            print(f"PASS               {name} rows={len(g)}{note}")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} no-oracle ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
