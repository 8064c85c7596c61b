"""Mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
count, schema (column names), and order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from metagraph_spark.session import get_spark
from metagraph_spark.sources.io import TABLES


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("selfcheck", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL  {name}: spark error: {str(exc)[:200]}")
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows, cols={scols} ({elapsed:.1f}s)")
            continue
        try:
            rel = con.execute(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"duckdb error: {exc}"))
            print(f"FAIL  {name}: duckdb error: {str(exc)[:200]}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"schema mismatch {scols} vs {dcols}"))
            print(f"FAIL  {name}: schema {scols} vs {dcols}")
            continue
        sn = normalize([dict(zip(scols, r)) for r in srows], scols)
        dn = normalize([dict(zip(dcols, r)) for r in drows], dcols)
        if len(sn) != len(dn):
            failures.append((name, f"rowcount {len(sn)} vs {len(dn)}"))
            print(f"FAIL  {name}: rowcount {len(sn)} vs {len(dn)} ({elapsed:.1f}s)")
            continue
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            failures.append((name, f"value mismatch, first diffs {diff}"))
            print(f"FAIL  {name}: values differ; first diffs: {diff}")
            continue
        print(f"OK    {name}: {len(sn)} rows match ({elapsed:.1f}s)")
    print(f"\n{len(failures)} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
