"""Scaling-efficiency evidence (BASELINE.json north_rule: throughput
scaling efficiency ≥ 0.8 going N → 4N executors).

No real cluster exists in the sandbox, so per the driver instruction we
run the IDENTICAL job on IDENTICAL input at two parallelism levels
(local[8] vs local[32] — N and 4N cores) in fresh JVMs, median of
--runs timed runs each, and report throughput at both + efficiency =
(T_N / T_4N) / 4 into BENCH/BASELINE.md.

The scaling workload is the NORTH-STAR JOB itself: the full fused check
suite (C1-C10 row checks + token-array invariants + C11 uniqueness +
R5 referential + drift) over the BASELINE-shaped tokenized-sequence
table (doc_id, tokens:array<int32>, n_tok, source), generated
deterministically in-memory (seeded, no disk I/O in the timed path) —
a compute-bound, whole-stage-codegen plan, which is exactly the shape
that must scale on a real cluster. The 23-query operator suite
(bench.py) is NOT used here: its per-query planning + collect overhead
(~0.2 s/query, driver-side) is fixed cost that a real 4× cluster would
not parallelize either, and at sandbox scale it dominates.

Usage: python tools/scaling_bench.py [--rows 400000] [--runs 3]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from check_datapackage_spark.session import get_spark
from check_datapackage_spark.fixtures import (
    allowed_sources_df, sequences_df, sequences_spec, token_invariant_checks)
from check_datapackage_spark.plans.validation import check_table
from check_datapackage_spark.operators import drift

cores = int(sys.argv[1]); n_rows = int(sys.argv[2]); runs = int(sys.argv[3])
spark = get_spark("scaling", cores=cores, shuffle_partitions=cores,
                  extra_conf={"spark.driver.memory": "48g"})

def job():
    df = sequences_df(spark, n_rows, partitions=cores * 4).drop("_row")
    res = check_table(df, sequences_spec(),
                      dims={"allowed_sources": allowed_sources_df(spark)},
                      extra_checks=token_invariant_checks())
    nv = res.violations.count()
    ns = res.summary.count()
    nd = drift.drift_by_group(df, "n_tok", "source", 1, 2049, 32).count()
    return nv + ns + nd

job()  # warm-up (codegen, JIT)
out = []
for _ in range(runs):
    t0 = time.perf_counter(); job(); out.append(time.perf_counter() - t0)
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_level(cores: int, n_rows: int, runs: int) -> list[float]:
    p = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, str(cores), str(n_rows), str(runs)],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT in child output:\n{p.stdout}\n{p.stderr}")


def main() -> None:
    n_rows = int(sys.argv[sys.argv.index("--rows") + 1]) if "--rows" in sys.argv else 400_000
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 3
    lo_cores, hi_cores = 8, 32

    lo = run_level(lo_cores, n_rows, runs)
    hi = run_level(hi_cores, n_rows, runs)
    t_lo, t_hi = statistics.median(lo), statistics.median(hi)
    eff = (t_lo / t_hi) / (hi_cores / lo_cores)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling efficiency evidence

North rule (BASELINE.json): throughput scaling efficiency >= 0.8 going
N -> 4N executors. Sandbox proxy (per driver instruction): identical
job, identical input, two parallelism levels (local[{lo_cores}] vs
local[{hi_cores}]), fresh JVM each, median of {runs} timed runs after a
warm-up run.

Workload = the north-star job: full fused check suite (C1-C10 +
token-array invariants + C11 uniqueness + R5 referential broadcast
anti-join + n_tok drift) over the BASELINE input-hint table
(doc_id, tokens:array<int32>, n_tok, source), {n_rows:,} rows,
deterministically generated in-memory (seed 42, Zipf-skewed source with
~50% hot key) — compute-bound whole-stage-codegen plan, no disk I/O.

| level | cores | runs (s) | median (s) | throughput (rows/s) |
|---|---|---|---|---|
| N | {lo_cores} | {', '.join(f'{x:.2f}' for x in lo)} | {t_lo:.2f} | {n_rows / t_lo:,.0f} |
| 4N | {hi_cores} | {', '.join(f'{x:.2f}' for x in hi)} | {t_hi:.2f} | {n_rows / t_hi:,.0f} |

**speedup {lo_cores}->{hi_cores} cores: {t_lo / t_hi:.2f}x;
scaling efficiency = ({t_lo:.2f}/{t_hi:.2f})/4 = {eff:.3f}**
(north-rule threshold: >= 0.8 {'MET' if eff >= 0.8 else 'NOT MET'})

Caveats: local[N] shares one JVM, one memory bus and one shuffle disk,
so this UNDER-states real-cluster scaling for shuffle-heavy stages and
has no network cost; the per-operator wall-clock suite at sf0.1 is
reported separately by bench.py (BENCH_r*.json).
"""
        )
    print(
        json.dumps(
            {
                "rows": n_rows,
                f"t{lo_cores}_median_s": round(t_lo, 3),
                f"t{hi_cores}_median_s": round(t_hi, 3),
                "speedup": round(t_lo / t_hi, 3),
                "efficiency": round(eff, 3),
                "written": path,
            }
        )
    )


if __name__ == "__main__":
    main()
