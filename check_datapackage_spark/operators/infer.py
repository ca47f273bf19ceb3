"""Schema/type inference over string columns — the `describe` half of
the Frictionless workflow (reference scope is check-only:
/root/reference/src/check_datapackage/check.py validates a descriptor
the user already has; a validation engine at 100 TB also needs to
PROPOSE one from raw string data, which is what
``frictionless describe`` does upstream of the reference).

Inference is SYNTACTIC (format regexes per Table Schema type), not
engine-cast-based: ``try_cast`` semantics differ between engines
('1.5' → BIGINT, 'yes' → BOOLEAN, bare years → DATE all disagree
between Spark and DuckDB), while RE2-compatible regexes evaluate
identically — so the DuckDB oracle twin is exact. The regexes mirror
Table Schema defaults: integer, number, boolean (true/false), date
(ISO yyyy-mm-dd), datetime (ISO with 'T' or space separator).

Plan (100 TB shape): ONE aggregation pass over the table computes
every per-column match count as a fused codegen expression (no UDF, no
per-column scans); the result is a single row that is then unpivoted
with ``stack`` — driver-free, constant-size output. Column pruning
pushes the projection of only the inspected columns into the scan.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Table Schema type → full-match regex (RE2-safe, DuckDB-identical).
#: Order = inference precedence (first fully-matching type wins).
TYPE_PATTERNS: list[tuple[str, str]] = [
    ("integer", r"[+-]?[0-9]+"),
    ("number", r"[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?"),
    ("boolean", r"(true|false|TRUE|FALSE|True|False)"),
    ("date", r"[0-9]{4}-[0-9]{2}-[0-9]{2}"),
    (
        "datetime",
        r"[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?",
    ),
]


def _matches(col: Column, pattern: str) -> Column:
    """Full-string match as 0/1 (NULL-safe: NULL → 0)."""
    return (
        F.coalesce(col.rlike("^(" + pattern + ")$"), F.lit(False))
    ).cast("long")


#: Java regex ``$`` (as used by ``rlike("^(...)$")``) also matches just
#: before one FINAL line terminator; RE2's does not. The Arrow path
#: appends this optional-terminator group so its full-match counts are
#: bit-identical to the JVM path on any input (pinned by test).
_JAVA_DOLLAR_TAIL = r"(?:\r\n|[\n\r\x{0085}\x{2028}\x{2029}])?"


def _infer_counts_arrow(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-row count frame matching the fused JVM aggregation of
    :func:`infer_field_types` — computed map-side with vectorized RE2
    (``pyarrow.compute.match_substring_regex``) over Arrow batches
    (guide §4.2), then one tiny sum of per-task partials. Casting to
    string stays in the JVM so cast semantics are untouched."""
    import pyarrow as pa

    pats = [
        (t, "\\A(?:" + p + ")" + _JAVA_DOLLAR_TAIL + "\\z")
        for t, p in TYPE_PATTERNS
    ]
    k = len(pats)
    names = ["_n"]
    for c in cols:
        names.append(f"_nn_{c}")
        names.extend(f"_{t}_{c}" for t, _ in pats)

    def counts(batches):
        import numpy as np
        import pyarrow.compute as pc

        acc = np.zeros(1 + len(cols) * (1 + k), dtype=np.int64)
        for b in batches:
            acc[0] += b.num_rows
            for j in range(len(cols)):
                arr = b.column(j)
                base = 1 + j * (1 + k)
                acc[base] += len(arr) - arr.null_count
                for ti, (_t, rex) in enumerate(pats):
                    m = pc.match_substring_regex(arr, rex)
                    s = pc.sum(pc.cast(m, pa.int64())).as_py()
                    acc[base + 1 + ti] += s or 0
        yield pa.record_batch(
            [pa.array([int(v)], pa.int64()) for v in acc], names=names
        )

    staged = df.select(*[F.col(c).cast("string").alias(c) for c in cols])
    partials = staged.mapInArrow(
        counts, ", ".join(f"`{n}` long" for n in names)
    )
    return partials.agg(
        *[F.sum(F.col(f"`{n}`")).alias(n) for n in names]
    )


def infer_field_types(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    method: str = "arrow",
) -> DataFrame:
    """Per-column syntactic type profile + inferred Table Schema type.

    Output: (field, n_rows, n_nonnull, n_integer, n_number, n_boolean,
    n_date, n_datetime, inferred_type) — one row per inspected column,
    counts integer-exact. ``inferred_type`` is the first TYPE_PATTERNS
    entry matching EVERY non-null value (string if none, also string
    for all-null columns — the Table Schema default type,
    SURVEY §2 G3).

    Single fused aggregation (all counts in one scan), then a
    constant-size ``stack`` unpivot of the 1-row result.

    ``method="arrow"`` (default, guide §4.2) computes the same counts
    map-side with vectorized RE2 over Arrow batches — the 40 fused
    ``rlike`` aggregates were ~70% of the pass — with a Java-``$``
    emulation so counts are bit-identical (test-pinned);
    ``method="sql"`` keeps the pure-JVM fused aggregation.
    """
    cols = list(columns) if columns is not None else df.columns
    if method == "arrow":
        one = _infer_counts_arrow(df, cols)
    else:
        aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
        for c in cols:
            sc = F.col(c).cast("string")
            aggs.append(F.count(sc).alias(f"_nn_{c}"))
            for t, pat in TYPE_PATTERNS:
                aggs.append(F.sum(_matches(sc, pat)).alias(f"_{t}_{c}"))
        one = df.agg(*aggs)

    # unpivot: stack(n_cols, 'name', _nn_name, _int_name, ...)
    parts: list[Column] = []
    for c in cols:
        parts.extend(
            [F.lit(c), F.col(f"_nn_{c}")]
            + [F.col(f"_{t}_{c}") for t, _ in TYPE_PATTERNS]
        )
    unpivoted = one.select(
        F.col("_n").alias("n_rows"),
        F.stack(
            F.lit(len(cols)),
            *parts,
        ).alias("field", "n_nonnull", *[f"n_{t}" for t, _ in TYPE_PATTERNS]),
    )

    inferred = F.lit("string")
    for t, _ in reversed(TYPE_PATTERNS):
        inferred = F.when(
            (F.col("n_nonnull") > 0) & (F.col(f"n_{t}") == F.col("n_nonnull")),
            F.lit(t),
        ).otherwise(inferred)
    return unpivoted.select(
        "field",
        "n_rows",
        "n_nonnull",
        *[f"n_{t}" for t, _ in TYPE_PATTERNS],
        inferred.alias("inferred_type"),
    )


#: a column is proposed as an enum iff its exact distinct count is at
#: most this (the Table Schema constraints.enum analog; ref
#: check.py enum handling is validation-side, SURVEY §2 C5 — this is
#: the describe-side proposal).
ENUM_MAX_DISTINCT = 16


def profile_constraints(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    enum_max_distinct: int = ENUM_MAX_DISTINCT,
) -> DataFrame:
    """Per-column constraint proposal profile:
    (field, n_nonnull, n_distinct, min_num, max_num, suggested_enum).

    * ``n_distinct`` — EXACT distinct count of non-null values.
    * ``min_num``/``max_num`` — numeric range over values that
      full-match the number lexical format (regex-guarded try_cast, so
      the DuckDB twin is exact); NULL when no value is numeric.
    * ``suggested_enum`` — ','-joined sorted distinct values iff
      ``n_distinct <= enum_max_distinct``, else NULL.

    Scale shape (100 TB): the table is unpivoted to (field, v) —
    n_cols× row duplication, same cost class as the Expand that
    multi-column exact countDistinct would generate — then TWO bounded
    aggregations: (1) per-field stats via partial (map-side) aggregation
    with distinct handled by an exact two-level agg on (field, v);
    (2) enum values are collected ONLY for fields that pass the
    distinct gate, from the already-deduplicated (field, v) pairs —
    never ``collect_set`` over raw rows, so executor memory is bounded
    by enum_max_distinct per surviving field, not by data cardinality.
    """
    cols = list(columns) if columns is not None else df.columns
    parts: list[Column] = []
    for c in cols:
        parts.extend([F.lit(c), F.col(c).cast("string")])
    long = df.select(
        F.stack(F.lit(len(cols)), *parts).alias("field", "v")
    ).where(F.col("v").isNotNull())

    num = F.when(
        F.col("v").rlike("^(" + dict(TYPE_PATTERNS)["number"] + ")$"),
        F.col("v"),
    ).try_cast("double")
    # distinct pairs once; both aggregates reuse it (and the enum pass
    # only ships <= enum_max_distinct rows per surviving field)
    pairs = long.groupBy("field", "v").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(num).alias("mn"),
        F.max(num).alias("mx"),
    )
    stats = pairs.groupBy("field").agg(
        F.sum("cnt").alias("n_nonnull"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.min("mn").alias("min_num"),
        F.max("mx").alias("max_num"),
    )
    enums = (
        pairs.join(
            stats.where(F.col("n_distinct") <= enum_max_distinct).select("field"),
            "field",
        )
        .groupBy("field")
        .agg(
            F.array_join(F.sort_array(F.collect_list("v")), ",").alias(
                "suggested_enum"
            )
        )
    )
    return stats.join(enums, "field", "left").select(
        "field", "n_nonnull", "n_distinct", "min_num", "max_num",
        "suggested_enum",
    )


def suggest_spec(
    df: DataFrame,
    name: str,
    columns: Optional[Sequence[str]] = None,
    with_constraints: bool = False,
) -> dict:
    """Propose a Table Schema resource descriptor from the data — the
    ``frictionless describe`` analog: runs :func:`infer_field_types`
    and emits ``{name, schema: {fields: [{name, type}, ...]}}`` with a
    ``required`` constraint for columns with zero observed nulls.

    The ONLY driver-side materialization is the per-column profile
    (len(columns) rows — constant in table size). The resulting dict is
    accepted by ``TableSpec.from_dict`` so the propose → check loop
    closes end-to-end (tests/test_infer.py).
    """
    cols = list(columns) if columns is not None else df.columns
    prof = {r["field"]: r for r in infer_field_types(df, cols).collect()}
    cons = (
        {r["field"]: r for r in profile_constraints(df, cols).collect()}
        if with_constraints
        else {}
    )
    fields = []
    for c in cols:
        r = prof[c]
        f: dict = {"name": c, "type": r["inferred_type"]}
        constraints: dict = {}
        if r["n_nonnull"] == r["n_rows"] and r["n_rows"] > 0:
            constraints["required"] = True
        p = cons.get(c)
        if p is not None:
            if p["suggested_enum"] is not None and r["inferred_type"] == "string":
                constraints["enum"] = p["suggested_enum"].split(",")
            if r["inferred_type"] in ("integer", "number") and p["min_num"] is not None:
                constraints["minimum"] = p["min_num"]
                constraints["maximum"] = p["max_num"]
        if constraints:
            f["constraints"] = constraints
        fields.append(f)
    return {"name": name, "schema": {"fields": fields}}
