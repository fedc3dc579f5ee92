#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry against the testdata parquet
tables, loads the Verify-dumped parquet for the same query, sorts columns
by name and rows by all columns, and compares values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return [cols[i] for i in idx], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            ores = con.sql(sql)
            ocols = list(ores.columns)
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            sres = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = list(sres.columns)
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_bad += 1
            continue
        oc, ov = canon(orows, ocols)
        sc, sv = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: schema mismatch oracle={oc} spark={sc}")
            n_bad += 1
        elif ov != sv:
            diffs = [
                (a, b) for a, b in zip(ov, sv) if a != b
            ][:3]
            print(
                f"FAIL {name}: {len(ov)} vs {len(sv)} rows; first diffs: {diffs}"
            )
            n_bad += 1
        else:
            print(f"OK   {name}: {len(sv)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
