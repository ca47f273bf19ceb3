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
    r6: the former per-ROW bincount vectors still exploded
    |rows| × n_buckets positions before the aggregation; now one
    ``mapInArrow`` pass accumulates a single histogram per (group,
    task) and emits only its nonzero buckets — shuffle traffic is
    |tasks| × |groups| × nonzero-buckets rows (guide §2.3 "aggregate
    before you shuffle").
    """
    import numpy as np

    width = (vocab + n_buckets - 1) // n_buckets
    cols = ([by] if by else []) + [tokens_col]
    if by:
        by_type = df.select(by).schema[0].dataType.simpleString()
        out_schema = f"`{by}` {by_type}, bucket int, count long"
    else:
        out_schema = "bucket int, count long"

    def partials(batches):
        import pyarrow as pa

        acc: dict = {}
        key_type = None
        for b in batches:
            if by:
                key_type = b.schema.field(0).type
            toks = b.column(len(cols) - 1).to_pandas()
            keys = b.column(0).to_pandas() if by else None
            for i, arr in enumerate(toks):
                if arr is None or len(arr) == 0:
                    continue
                a = np.asarray(arr, dtype=np.int64)
                a = a[(a >= 0) & (a < vocab)] // width
                key = keys[i] if by else None
                v = acc.get(key)
                if v is None:
                    v = acc[key] = np.zeros(n_buckets, np.int64)
                v += np.bincount(a, minlength=n_buckets)
        out_keys, out_buckets, out_counts = [], [], []
        for key, v in acc.items():
            nz = np.nonzero(v)[0]
            out_keys.extend([key] * len(nz))
            out_buckets.extend(nz.tolist())
            out_counts.extend(v[nz].tolist())
        if not acc:
            return
        arrays = []
        names = []
        if by:
            arrays.append(pa.array(out_keys, type=key_type))
            names.append(by)
        arrays.append(pa.array(out_buckets, pa.int32()))
        names.append("bucket")
        arrays.append(pa.array(out_counts, pa.int64()))
        names.append("count")
        yield pa.record_batch(arrays, names=names)

    group = ([F.col(by)] if by else [])
    return (
        df.select(*cols)
        .mapInArrow(partials, out_schema)
        .groupBy(*group, "bucket")
        .agg(F.sum("count").alias("count"))
    )


def ks_drift_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    base_group,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic of every group's
    ``value_col`` distribution against a baseline group:
    ``KS = max over v of |ECDF_g(v) - ECDF_base(v)|``. The third drift
    lens next to KL/PSI (:func:`drift_from_histogram`) — KS is
    binning-free and sensitive to location shifts that coarse buckets
    hide.

    Output: (group, n, base_n, ks) — ks rounded to 6 decimals.

    Exactness/scale contract: computed on the DISTINCT-VALUE grid, so
    it is exact for discrete/bounded domains (token counts, lengths,
    ids — the validation targets). The heavy pass is ONE combine-backed
    groupBy(group, value); the grid (|domain| × |groups| rows after a
    broadcast cross join) and the per-group cumulative windows operate
    on aggregated counts only. For unbounded continuous columns,
    pre-quantize (the t-digest path covers quantile questions there).
    """
    from pyspark.sql import Window as W

    c = df.groupBy(
        F.col(group_col).alias("grp"), F.col(value_col).alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    values = c.select("v").distinct()
    groups = c.select("grp").distinct()
    totals = c.groupBy("grp").agg(F.sum("c").alias("n"))
    # dense grid: every group sees the full value domain (missing
    # values carry the previous cumulative count via the cumsum of 0)
    grid = values.crossJoin(F.broadcast(groups))
    filled = grid.join(c, ["grp", "v"], "left").fillna(0, ["c"])
    cum = filled.withColumn(
        "cum",
        F.sum("c").over(
            W.partitionBy("grp")
            .orderBy("v")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    base = (
        cum.filter(F.col("grp") == F.lit(base_group))
        .select("v", F.col("cum").alias("bcum"))
    )
    base_n = (
        totals.filter(F.col("grp") == F.lit(base_group))
        .select(F.col("n").alias("base_n"))
    )
    return (
        cum.filter(F.col("grp") != F.lit(base_group))
        .join(base, "v")
        .join(F.broadcast(totals), "grp")
        .crossJoin(F.broadcast(base_n))
        .groupBy(F.col("grp").alias(group_col), "n", "base_n")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum").cast("double") / F.col("n")
                        - F.col("bcum").cast("double") / F.col("base_n")
                    )
                ),
                6,
            ).alias("ks")
        )
    )
