#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare, for iterating on
new queries before a round drive. Usage:

  python3 scripts/local_verify.py <sfDir> <verifyOutDir> [query ...]

Expects `graft.Verify` to have been run first with the same outDir (it
writes <name>/ parquet dirs plus oracle_sql.json). Compares each named
query (default: every oracle entry present in outDir): row count, sorted
column names, and a value hash over rows sorted by all columns, floats
rounded to 9 significant digits to absorb engine-formatting noise (the
queries themselves round any transcendental output to fewer digits).
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame(con, sql):
    res = con.sql(sql)
    cols = list(res.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm(r[i]) for i in order) for r in res.fetchall()]
    return sorted(cols), sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'"
                    if os.path.isdir(p) else
                    f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    names = sorted(only or (set(oracle) &
                   {os.path.basename(d) for d in glob.glob(out_dir + "/*")
                    if os.path.isdir(d)}))
    bad = 0
    for name in names:
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            print(f"{name}: MISSING spark output")
            bad += 1
            continue
        scols, srows = frame(
            con, f"SELECT * FROM '{pdir}/*.parquet'")
        if name not in oracle:
            print(f"{name}: rows-only ({len(srows)} rows)")
            continue
        try:
            ocols, orows = frame(con, oracle[name])
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            bad += 1
            continue
        if scols != ocols:
            print(f"{name}: SCHEMA MISMATCH spark={scols} oracle={ocols}")
            bad += 1
        elif len(srows) != len(orows):
            print(f"{name}: ROWS MISMATCH spark={len(srows)} oracle={len(orows)}")
            bad += 1
        elif srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"{name}: HASH MISMATCH first diffs {diff}")
            bad += 1
        else:
            print(f"{name}: ok ({len(srows)} rows)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
