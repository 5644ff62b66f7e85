#!/usr/bin/env python
"""Replicate the driver's correctness gate locally: run each queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet tables,
compare row count, sorted-column schema, and an order-insensitive value hash.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [qname ...]
Env:   SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime as dt
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    import __spark_entry__ as entrymod
    from identity_matching_spark.session import get_spark

    QUERIES = entrymod.queries()
    ORACLES = entrymod.oracle_sql()

    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in ORACLES:
            print(f"~ {name}: rows-only ({len(srows)} rows, {t1-t0:.1f}s) — no oracle")
            continue
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if not problems:
            hs = table_hash([tuple(r) for r in srows], scols)
            hd = table_hash(drows, dcols)
            if hs != hd:
                problems.append(f"value-hash {hs} vs {hd}")
                # show a few diff lines for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ls = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in [tuple(x) for x in srows])
                ld = sorted("|".join(norm_cell(r[i]) for i in order_d) for r in drows)
                diff = [(a, b) for a, b in zip(ls, ld) if a != b][:3]
                for a, b in diff:
                    print(f"    spark: {a}\n    duck : {b}")
        if problems:
            print(f"✗ {name}: {'; '.join(problems)} ({t1-t0:.1f}s)")
            failures.append(name)
        else:
            print(f"✓ {name}: {len(srows)} rows match ({t1-t0:.1f}s spark)")
    print()
    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
