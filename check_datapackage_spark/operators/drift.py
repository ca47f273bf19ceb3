"""Distribution drift — per-partition histograms + KL / PSI / JS.

BASELINE operator absent from the reference (SURVEY §2.8): detect a
partition whose ``n_tok`` (or token-value) distribution shifted vs the
rest of the table.

Scale design:
* The heavy pass is ONE ``groupBy(group, bucket).count()`` — partial
  aggregation bounds shuffle traffic at |groups|·|buckets| longs.
* Bucketing is a pure expression: fixed-width via ``width_bucket`` —
  deterministic, no sampling pass. (A quantile-bucket variant would
  need a first pass for edges; fixed-width keeps it single-pass when
  bounds are declared, e.g. n_tok ∈ [1, 2048].)
* Divergence math runs on the *histogram table* (thousands of rows, not
  the raw data) — plain DataFrame arithmetic after a bucket-aligned
  join. For token-value histograms over array columns we bincount via
  a vectorized pandas UDF (Arrow batches) to avoid exploding 10^12×2k
  token rows — see ``token_histogram``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_expr(col, lo: float, hi: float, n_buckets: int):
    """width_bucket as explicit floor arithmetic (identical to Spark's
    width_bucket, but expressible verbatim in ANSI SQL / DuckDB for the
    oracle cross-checks): 0 below lo, n+1 at/above hi, else
    floor((x-lo)/(hi-lo)*n)+1."""
    x = col.cast("double")
    lo_l, hi_l, n_l = F.lit(float(lo)), F.lit(float(hi)), F.lit(n_buckets)
    return (
        F.when(x < lo_l, F.lit(0))
        .when(x >= hi_l, n_l + 1)
        .otherwise(F.floor((x - lo_l) / (hi_l - lo_l) * n_l) + 1)
        .cast("long")
    )


def bucket_sql(col: str, lo: float, hi: float, n_buckets: int) -> str:
    """The same bucket formula as ANSI SQL text (DuckDB oracle twin)."""
    x = f"CAST({col} AS DOUBLE)"
    return (
        f"CASE WHEN {x} < {lo} THEN 0 "
        f"WHEN {x} >= {hi} THEN {n_buckets + 1} "
        f"ELSE CAST(FLOOR(({x} - {lo}) / ({hi} - {lo}) * {n_buckets}) AS BIGINT) + 1 END"
    )


def histogram(
    df: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_buckets: int = 32,
    by: Optional[str] = None,
) -> DataFrame:
    """Fixed-width histogram: (bucket, count)[ + by].

    Bucket 0 = below lo, n_buckets+1 = at/above hi (width_bucket
    semantics); NULLs are dropped.
    """
    b = bucket_expr(F.col(column), lo, hi, n_buckets)
    group = ([F.col(by)] if by else []) + [b.alias("bucket")]
    return (
        df.where(F.col(column).isNotNull())
        .groupBy(*group)
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _normalized(hist: DataFrame, keys: list[str]) -> DataFrame:
    """Add probability column p = count / sum(count) over keys.

    The global (no-keys) case is a scalar agg broadcast back onto the
    rows — NOT a ``partitionBy(lit(1))`` window, which Spark executes
    as a single-partition WindowExec ("No Partition Defined" warning)
    and which would serialize an unbounded frame through one task.
    """
    if keys:
        from pyspark.sql import Window as W

        w = W.partitionBy(*keys)
        return hist.withColumn("p", F.col("count") / F.sum("count").over(w))
    total = hist.agg(F.sum("count").alias("_total"))
    return hist.crossJoin(F.broadcast(total)).withColumn(
        "p", F.col("count") / F.col("_total")
    ).drop("_total")


def divergence(
    hist_a: DataFrame,
    hist_b: DataFrame,
    on: str = "bucket",
    eps: float = 1e-9,
) -> DataFrame:
    """KL(a‖b), PSI and Jensen-Shannon between two histograms.

    Inputs: (bucket, count). Missing buckets on either side get an
    epsilon mass (standard PSI smoothing) so the logs stay finite.
    Output: one row (kl, psi, js).
    """
    a = _normalized(hist_a, []).select(F.col(on).alias("bucket"), F.col("p").alias("pa"))
    b = _normalized(hist_b, []).select(F.col(on).alias("bucket"), F.col("p").alias("pb"))
    j = a.join(b, "bucket", "full_outer").select(
        F.coalesce("pa", F.lit(eps)).alias("pa"),
        F.coalesce("pb", F.lit(eps)).alias("pb"),
    )
    m = ((F.col("pa") + F.col("pb")) / 2).alias("pm")
    return j.select(F.col("pa"), F.col("pb"), m).agg(
        F.sum(F.col("pa") * F.log(F.col("pa") / F.col("pb"))).alias("kl"),
        F.sum(
            (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))
        ).alias("psi"),
        (
            F.sum(F.col("pa") * F.log(F.col("pa") / F.col("pm"))) / 2
            + F.sum(F.col("pb") * F.log(F.col("pb") / F.col("pm"))) / 2
        ).alias("js"),
    )


def drift_by_group(
    df: DataFrame,
    column: str,
    by: str,
    lo: float,
    hi: float,
    n_buckets: int = 32,
    eps: float = 1e-9,
) -> DataFrame:
    """PSI/KL of each group's distribution vs the global distribution.

    One histogram pass; the global reference is re-aggregated from the
    per-group histogram (no second scan). Output:
    (group, kl, psi, n) — flag drift with a threshold (PSI > 0.2 is the
    conventional 'significant shift').
    """
    h = histogram(df, column, lo, hi, n_buckets, by=by)
    return drift_from_histogram(h, by, eps=eps)


def drift_from_histogram(h: DataFrame, by: str, eps: float = 1e-9) -> DataFrame:
    """PSI/KL of each group vs the global, from a precomputed
    (by, bucket, count) histogram — the shared core of
    :func:`drift_by_group` and :func:`token_histogram` drift (q39).

    The global reference is derived from the per-group histogram with
    window sums over the AGGREGATED table (≤ groups × buckets rows) —
    a single lineage, so the histogram scan over the full input runs
    exactly once per action with NO cache (r4 ADVICE: the previous
    ``h.cache()`` here leaked cached partitions across repeated calls
    in dashboards/foreachBatch loops). The unpartitioned total window
    funnels only the tiny histogram through one task — never input
    rows."""
    from pyspark.sql import Window as W

    w_bucket = W.partitionBy("bucket")
    w_group = W.partitionBy(by)
    w_all = W.partitionBy()
    joined = (
        h.select(
            F.col(by),
            (F.col("count") / F.sum("count").over(w_group)).alias("pa"),
            (
                F.sum("count").over(w_bucket)
                / F.sum("count").over(w_all)
            ).alias("pb"),
        )
        .select(
            by,
            F.greatest(F.col("pa"), F.lit(eps)).alias("pa"),
            F.greatest(F.col("pb"), F.lit(eps)).alias("pb"),
        )
    )
    return joined.groupBy(by).agg(
        F.sum(F.col("pa") * F.log(F.col("pa") / F.col("pb"))).alias("kl"),
        F.sum((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))).alias(
            "psi"
        ),
    )


def token_histogram(
    df: DataFrame,
    tokens_col: str = "tokens",
    vocab: int = 50257,
    n_buckets: int = 256,
    by: Optional[str] = None,
) -> DataFrame:
    """Histogram of token *values* bucketed into vocab ranges — WITHOUT
    exploding the token arrays.

    ``explode`` on 10^12 rows × ~1k tokens would shuffle 10^15 rows.
    Instead a vectorized pandas UDF bincounts each Arrow batch into a
    fixed-size vector; Spark then sums the small vectors. Shuffle
    traffic: |tasks| × n_buckets longs.
    """
    import numpy as np
    from pyspark.sql import types as T

    width = (vocab + n_buckets - 1) // n_buckets

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bincount_batch(tok: pd.Series) -> pd.Series:
        out = []
        for arr in tok:
            if arr is None or len(arr) == 0:
                out.append(np.zeros(n_buckets, dtype=np.int64))
                continue
            a = np.asarray(arr)
            a = a[(a >= 0) & (a < vocab)] // width
            out.append(np.bincount(a, minlength=n_buckets).astype(np.int64))
        return pd.Series(out)

    counts = df.select(
        *([F.col(by)] if by else []),
        bincount_batch(F.col(tokens_col)).alias("_bc"),
    )
    # Sum the per-row vectors: element-wise array sum via aggregate on
    # zipped arrays — done with posexplode of the SMALL fixed-size
    # vector (n_buckets per row, bounded) then groupBy(bucket).
    group = ([F.col(by)] if by else [])
    return (
        counts.select(*group, F.posexplode("_bc").alias("bucket", "c"))
        .where(F.col("c") > 0)
        .groupBy(*group, "bucket")
        .agg(F.sum("c").alias("count"))
    )
