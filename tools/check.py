#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ spark parquet result, runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB
(each testdata parquet registered as a view under its bare table
name), and compares: column names (sorted), dtypes, row counts, and
row-sorted values. Exit code 1 if anything mismatches.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, ignore_index=True)
    return df


def cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        gh = [tuple(cell(v) for v in r) for r in g.itertuples(index=False)]
        wh = [tuple(cell(v) for v in r) for r in w.itertuples(index=False)]
        if gh != wh:
            bad = next(i for i, (a, b) in enumerate(zip(gh, wh)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  spark:  {gh[bad]}")
            print(f"  oracle: {wh[bad]}")
            failures += 1
            continue
        print(f"OK   {name} ({len(g)} rows, {len(g.columns)} cols)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
