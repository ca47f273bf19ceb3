"""Per-query measurement harness for optimization work (guide §1).

NOT the frozen driver bench (bench.py). Usage:

    python bench_extra.py [--sf DIR] [--runs N] [--explain PREFIX] q57 q46 ...

Times each named query (prefix match on registry names) with one
untimed warm-up then ``--runs`` timed runs, result pulled via
``toPandas()`` exactly like bench.py, cache cleared between runs.
With ``--explain DIR/PREFIX`` also writes ``<prefix><name>.txt`` with
``.explain("formatted")`` output. Prints one JSON line per query:
{"name", "median", "min", "runs": [...], "rows", "cal"}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_datapackage_spark.queries import QUERIES
from check_datapackage_spark.session import get_spark
from bench import cpu_calibration


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    runs = 3
    explain_prefix = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--explain":
            explain_prefix = args[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1
    selected = [
        q for q in sorted(QUERIES) if any(q.startswith(n) for n in names)
    ] or sorted(QUERIES)

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("cdp-bench-extra", cores=cores, shuffle_partitions=cores)
    out = {}
    for name in selected:
        spark.sparkContext.setJobDescription(name)
        if explain_prefix:
            df = QUERIES[name](spark, sf_dir)
            with open(f"{explain_prefix}{name}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()
        # untimed warm-up (JIT/codegen)
        QUERIES[name](spark, sf_dir).toPandas()
        spark.catalog.clearCache()
        samples = []
        nrows = 0
        for _ in range(runs):
            t0 = time.perf_counter()
            nrows = len(QUERIES[name](spark, sf_dir).toPandas())
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        rec = {
            "name": name,
            "median": round(statistics.median(samples), 3),
            "min": min(samples),
            "runs": samples,
            "rows": nrows,
            "cal": round(cpu_calibration()),
        }
        out[name] = rec
        print(json.dumps(rec), flush=True)
    print(json.dumps({"total_median": round(sum(r["median"] for r in out.values()), 3),
                      "sf_dir": sf_dir}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
