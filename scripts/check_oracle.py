#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Re-implements the compare described in FIXTURES.md §5: run each
oracle_sql.json query in DuckDB over the same parquet tables, sort columns
by name, sort rows, normalize values, and diff against the Spark parquet
output that graft.Verify wrote. Strictly a dev tool (driver-side python).
"""
import sys, json, glob, os, math
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        return str(v.normalize()) if v == v.to_integral_value() else str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracles):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        tbl = pq.read_table(files[0])
        s_cols = tbl.column_names
        s_rows = [tuple(r[c] for c in s_cols) for r in tbl.to_pylist()]
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        sc, sr = canon(s_cols, s_rows)
        dc, dr = canon(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            n_bad += 1
        elif sr != dr:
            n_bad += 1
            diff = [(a, b) for a, b in zip(sr, dr) if a != b]
            print(f"FAIL {name}: {len(sr)} vs {len(dr)} rows; first diffs:")
            for a, b in diff[:3]:
                print(f"   spark : {a}\n   duckdb: {b}")
            if len(sr) != len(dr):
                only_s = set(sr) - set(dr)
                only_d = set(dr) - set(sr)
                for x in list(only_s)[:2]:
                    print(f"   only-spark : {x}")
                for x in list(only_d)[:2]:
                    print(f"   only-duckdb: {x}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(sr)} rows)")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
