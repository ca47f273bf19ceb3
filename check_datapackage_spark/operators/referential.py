"""Referential integrity (R5 data-plane) — broadcast anti-join.

The reference checks FK *declarations* only
(``_check_fk_dest_fields_diff_resource``, check.py:474-513); this is the
data-plane analog from BASELINE.json: every fact key must exist in the
dimension.

Scale design: the dimension's distinct key set is small (allowed
``source`` values ≈ hundreds) → ``F.broadcast`` makes the anti-join a
map-side hash lookup with ZERO shuffle of the fact table. For large
dimensions drop the broadcast hint and let AQE pick (it still converts
to broadcast at runtime if the built side is under the threshold).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..issue import VIOLATION_COLUMNS


def missing_keys(
    fact: DataFrame,
    dim: DataFrame,
    fact_keys: Sequence[str],
    dim_keys: Optional[Sequence[str]] = None,
    broadcast: bool = True,
) -> DataFrame:
    """Fact rows whose key is absent from the dimension (NOT EXISTS).

    NULL fact keys are excluded — null-ness is C1's job, mirroring SQL FK
    semantics where NULL references are not violations.
    """
    dim_keys = list(dim_keys or fact_keys)
    fact_keys = list(fact_keys)
    # no dropDuplicates: anti-join semantics ignore duplicate build keys,
    # and the distinct would add the plan's only shuffle (the broadcast
    # HashedRelation dedups keys for free)
    keyed = dim.select(*[F.col(d).alias(f) for f, d in zip(fact_keys, dim_keys)])
    if broadcast:
        keyed = F.broadcast(keyed)
    non_null = fact
    for k in fact_keys:
        non_null = non_null.where(F.col(k).isNotNull())
    return non_null.join(keyed, on=fact_keys, how="left_anti")


def referential_violations(
    fact: DataFrame,
    dim: DataFrame,
    fact_keys: Sequence[str],
    dim_keys: Sequence[str],
    table_name: str,
    dim_name: str,
    row_key: Optional[str] = None,
    partition: Optional[str] = None,
    broadcast: bool = True,
    distinct: bool = False,
) -> DataFrame:
    """Violation rows for FK misses (VIOLATION_FULL_SCHEMA).

    ``distinct=True`` emits one row per distinct missing KEY instead of
    one per fact row (guide §2.3 — callers that dedup by jsonpath
    anyway should dedup here: the distinct then shuffles only the
    narrow key columns with map-side combine, not fully-built
    violation strings). Only valid with the default row_key/partition,
    which are functions of the key columns.
    """
    fact_keys = list(fact_keys)
    misses = missing_keys(fact, dim, fact_keys, dim_keys, broadcast=broadcast)
    if distinct:
        if row_key is not None or partition is not None:
            raise ValueError("distinct=True requires default row_key/partition")
        misses = misses.select(*fact_keys).dropDuplicates(fact_keys)
    key_str = F.concat_ws("|", *[F.col(k).cast("string") for k in fact_keys])
    col_name = ",".join(fact_keys)
    if isinstance(row_key, (list, tuple)):
        rk_cols = [k for k in row_key if k in fact.columns]
        rk = (
            F.concat_ws("|", *[F.col(k).cast("string") for k in rk_cols])
            if rk_cols
            else key_str
        )
    elif row_key and row_key in fact.columns:
        rk = F.col(row_key).cast("string")
    else:
        rk = key_str
    part = (
        F.col(partition).cast("string")
        if partition and partition in fact.columns
        else F.lit(None).cast("string")
    )
    return misses.select(
        F.concat(
            F.lit(f"$.{table_name}["), rk, F.lit(f"].{col_name}")
        ).alias("jsonpath"),
        F.lit("foreign-key").alias("type"),
        F.lit(
            f"value of `{col_name}` not found in `{dim_name}`"
        ).alias("message"),
        key_str.alias("instance"),
        F.lit(f"{col_name}.foreign-key").alias("check"),
        F.lit(col_name).alias("column"),
        rk.alias("row_key"),
        part.alias("partition"),
    ).select(*VIOLATION_COLUMNS)


def reconcile(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_measure: Column,
    dim_measure: Column,
) -> DataFrame:
    """Cross-table aggregate reconciliation — the other half of
    referential integrity: not just "does the key exist" but "do the
    MEASURES agree" (sum of line items vs the order header total, rows
    ingested vs manifest counts, token counts vs shard metadata).

    ``fact_measure``/``dim_measure`` should be INTEGER expressions
    (e.g. cents via round(x*100)): integer sums are associative, so
    the comparison is exact under ANY partitioning/aggregation order —
    double sums differ in the last ulp between engines and between
    runs (oracle-exactness rule).

    Returns one row per key: (key, expected, actual, diff) where
    ``actual`` is the fact-side aggregate, ``expected`` the dim-side
    value, and keys missing from either side surface as NULL on that
    side (a missing dim row IS a reconciliation failure). Scale shape:
    ONE map-side-combinable aggregation of the fact, then a key join
    with the dim — co-partitioned/bucketed layouts make the join
    shuffle-free; there is no per-key window and no driver traffic.
    """
    f = fact.groupBy(F.col(fact_key).alias("key")).agg(
        F.sum(fact_measure).alias("actual")
    )
    d = dim.select(
        F.col(dim_key).alias("key"), dim_measure.alias("expected")
    )
    return f.join(d, "key", "full_outer").select(
        "key",
        "expected",
        "actual",
        (F.coalesce(F.col("actual"), F.lit(0)) -
         F.coalesce(F.col("expected"), F.lit(0))).alias("diff"),
    )
