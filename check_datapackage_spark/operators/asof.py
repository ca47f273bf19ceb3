"""As-of (most-recent-prior) join — Spark has no native one
(pyspark_guide 'Common OLAP patterns').

Implementation is the union trick, all built-in expressions:

1. tag left rows 1, right rows 0; union on (key, ts, tag, payload)
2. one shuffle: window partitionBy(key) orderBy(ts, tag, seq)
3. ``last(right_col, ignorenulls=True)`` over the unbounded-preceding
   frame carries the latest right payload forward
4. keep left rows; optional tolerance filter on ts distance

Cost: ONE shuffle of |left|+|right| rows on the join key + a window
sort — same asymptotics as a sort-merge join, no Python. Equal
timestamps: the right row sorts first (tag 0 < 1), so ``>=`` semantics
match DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``. Ties among right rows
at the same (key, ts) break by ``seq_col`` (required for determinism).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    seq_col: Optional[str] = None,
    tolerance_us: Optional[int] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` on the same key.

    Output: all left columns + ``<c><suffix>`` for each right col +
    ``<right_ts><suffix>`` (null when no prior right row, or outside
    ``tolerance_us``).
    """
    right_cols = list(right_cols)
    lcols = left.columns

    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast("long").alias("_rseq"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    rseq = (
        F.col(seq_col).cast("long")
        if seq_col
        else F.lit(0).cast("long")
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_tag"),
        rseq.alias("_rseq"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).cast("timestamp").alias("_r_ts"),
    )
    u = l.unionByName(r)

    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_tag", "_rseq")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in right_cols
    ] + [F.last("_r_ts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}")]

    out = u.select("*", *carried).where(F.col("_tag") == 1)
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col("_ts"))
            - F.unix_micros(F.col(f"{right_ts}{suffix}"))
        ) <= tolerance_us
        out = out.select(
            *lcols,
            *[
                F.when(in_tol, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in right_cols
            ],
            F.when(in_tol, F.col(f"{right_ts}{suffix}")).alias(f"{right_ts}{suffix}"),
        )
    else:
        out = out.select(
            *lcols, *[f"{c}{suffix}" for c in right_cols], f"{right_ts}{suffix}"
        )
    return out


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start_col: str,
    end_col: str,
    keys: Optional[Sequence[str]] = None,
    bucket_s: int = 3600,
) -> DataFrame:
    """Interval/range join — the second temporal join Spark lacks
    natively (task brief §custom operators, next to :func:`asof_join`):
    match each fact row to the interval rows with
    ``start <= fact_ts < end`` on the same ``keys``.

    A naive ``ON ts BETWEEN start AND end`` makes Spark fall back to a
    broadcast-nested-loop or a cartesian per key — O(|facts|·|intervals|)
    per key. The scalable shape bucketizes time: facts map to ONE
    bucket ``floor(ts / bucket_s)``; each interval explodes to the
    (bounded) buckets it covers via ``sequence`` — so the join is an
    EQUI-join on (keys…, bucket) with the exact range predicate as a
    post-filter. Shuffle = |facts| + Σ interval-spans rows on a
    hashable key; fan-out per interval is ``len/bucket_s + 1``, bounded
    by choosing ``bucket_s`` near the typical interval length (the
    documented knob; AQE splits hot (key, bucket) pairs).

    Columns from both sides are kept (interval columns win on name
    clashes — select/alias beforehand if both sides share payload
    names). Facts matching no interval are dropped (inner semantics).
    """
    keys = list(keys or [])
    us = F.unix_micros(F.col(fact_ts).cast("timestamp"))
    width = F.lit(int(bucket_s) * 1_000_000)
    f = facts.withColumn("_b", (us / width).cast("long"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                (s_us / width).cast("long"), (e_us / width).cast("long")
            )
        ),
    )
    joined = f.join(iv, keys + ["_b"])
    return joined.filter(
        (us >= s_us) & (us < e_us)
    ).drop("_b")
