"""Self-check harness mirroring the driver's correctness gate: run each
queries() entry on Spark AND its oracle_sql() on DuckDB over the same
parquet, compare row count + column names + order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_datapackage_spark.queries import ORACLES, QUERIES
from check_datapackage_spark.sources.registry import TABLES
from check_datapackage_spark.session import get_spark


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and representation jitter below 1e-9
        return round(v + 0.0, 9)
    return v


def run(sf_dir: str, names: list[str]) -> int:
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in names:
        fn = QUERIES[name]
        sql = ORACLES.get(name)
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if sql is None:
            print(f"{name}: rows-only ({len(srows)} rows) — no oracle")
            continue
        ddf = con.sql(sql)
        dcols = [d[0] for d in ddf.description]
        drows = ddf.fetchall()
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"{name}: COLUMN MISMATCH spark={scols} duck={dcols}")
            ok = False
        if len(srows) != len(drows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}")
            ok = False
        if ok:
            order = sorted(scols)
            sset = sorted(
                tuple(norm(r[c]) for c in order) for r in (row.asDict() for row in srows)
            )
            dset = sorted(
                tuple(norm(dict(zip(dcols, r))[c]) for c in order) for r in drows
            )
            if sset != dset:
                ok = False
                print(f"{name}: VALUE MISMATCH")
                for a, b in zip(sset, dset):
                    if a != b:
                        print(f"  spark={a}\n  duck ={b}")
                        break
        print(f"{name}: {'OK' if ok else 'FAIL'} ({len(srows)} rows)")
        failures += 0 if ok else 1
    spark.stop()
    return failures


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    sys.exit(1 if run(sf_dir, names) else 0)
