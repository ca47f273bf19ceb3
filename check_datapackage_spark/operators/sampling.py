"""Deterministic (hash-based) sampling and stratified data mixing —
the reproducible-subsampling / source-reweighting step of a training
pipeline (task brief; no reference analog).

Why not ``df.sample()``: Spark's sampler is seed-dependent per
partitioning — the same row can be in or out depending on task layout,
which breaks resumable pipelines and cross-engine verification. Here
membership is a pure function of the ROW (md5 of its key), so the
sample is stable under repartitioning, resumable across runs, and
exactly reproducible in any SQL engine (the q43 oracle).

Scale: both operators are map-side only — a filter (down-sample) or a
``sequence``+``explode`` row replication (up-sample). Zero shuffle;
the mix factors ride along as a literal CASE expression.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unit_hash(key: Column, salt: str = "") -> Column:
    """Uniform double in [0, 1): first 8 md5 hex chars of ``key||salt``
    scaled by 2^-32. Exact dyadic arithmetic — any engine computing the
    same md5 gets the same double bit-for-bit."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("double")
    return h / F.lit(float(1 << 32))


def deterministic_sample(
    df: DataFrame, fraction: float, key: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep each row iff ``unit_hash(key) < fraction`` — a stable,
    repartition-proof Bernoulli sample. Change ``salt`` to draw an
    independent sample (e.g. per epoch)."""
    return df.where(unit_hash(F.col(key), salt) < F.lit(float(fraction)))


def stratified_mix(
    df: DataFrame,
    factors: Mapping[str, float],
    strata_col: str = "source",
    key: str = "doc_id",
    salt: str = "",
    default: float = 1.0,
) -> DataFrame:
    """Reweight strata by real-valued factors: factor 0.25 keeps a
    quarter of the stratum, 2.5 emits every row twice plus a stable
    50% third copy. Adds ``_rep`` (1..copies) so replicated rows stay
    distinguishable downstream (e.g. for shuffling buffers).

    copies(row) = floor(f) + [unit_hash(row) < frac(f)] — the integer
    part is deterministic replication via sequence+explode (map-side,
    no shuffle), the fractional part the same stable Bernoulli draw as
    :func:`deterministic_sample`.
    """
    f: Column = F.lit(float(default))
    for stratum, factor in sorted(factors.items()):
        f = F.when(F.col(strata_col) == stratum, F.lit(float(factor))).otherwise(f)
    whole = F.floor(f).cast("long")
    copies = whole + (unit_hash(F.col(key), salt) < (f - whole)).cast("long")
    return (
        df.withColumn("_copies", copies)
        .where(F.col("_copies") > 0)
        .withColumn("_rep", F.explode(F.sequence(F.lit(1), F.col("_copies"))))
        .drop("_copies")
    )
