"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf", ...}.

``value`` = total wall-clock seconds for the full suite (one timed run
per query after a session warm-up query). Per-query seconds in
"queries". Scaling-efficiency runs (N vs 4N cores) live in
tools/scaling_bench.py which writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_datapackage_spark.queries import QUERIES
from check_datapackage_spark.session import get_spark

#: queries timed by the benchmark — every registered operator query.
HEADLINE = sorted(QUERIES)


def run_suite(spark, sf_dir: str, names=HEADLINE) -> tuple[dict, dict, int]:
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    total_rows = 0
    for name in names:
        t0 = time.perf_counter()
        # toPandas = Arrow-batched result transfer (collect() serializes
        # row-by-row through py4j — 5-10x slower for 100k+ row results)
        n = len(QUERIES[name](spark, sf_dir).toPandas())
        times[name] = round(time.perf_counter() - t0, 3)
        rows[name] = n
        total_rows += n
        # drop any intra-query persists so queries don't interfere
        spark.catalog.clearCache()
    return times, rows, total_rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("cdp-bench", cores=cores, shuffle_partitions=cores)

    # warm-up: JVM/codegen/Arrow paths (not timed)
    QUERIES["q02_profile_lineitem"](spark, sf_dir).collect()

    t0 = time.perf_counter()
    times, rows, _ = run_suite(spark, sf_dir)
    total = round(time.perf_counter() - t0, 3)

    n_input = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": f"validation suite wall-clock ({len(HEADLINE)} operator queries)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cores": cores,
                "lineitem_rows": n_input,
                "rows_per_sec": round(n_input / total, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
