"""Unit tests for operators/vectors.embedding_quality and
operators/text.tfidf_top_terms edge cases the oracle queries don't
plant (null vectors, empty arrays, empty text)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql import types as T

from check_datapackage_spark.operators.text import tfidf_top_terms
from check_datapackage_spark.operators.vectors import embedding_quality

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def test_embedding_quality_counters(spark):
    rows = [
        (0, [3.0, 4.0], 0),          # norm 5 > hi
        (1, [0.6, 0.8], 0),          # norm 1.0 in range
        (2, None, 0),                # null
        (3, [0.0, 0.0], 0),          # zero (also < lo)
        (4, [float("nan"), 1.0], 0), # non-finite
        (5, [float("inf"), 1.0], 0), # non-finite
        (6, [1.0], 0),               # bad dim, norm 1.0 in range
        (7, [], 0),                  # empty: bad dim, zero norm
    ]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    out = embedding_quality(
        df, by="label", expected_dim=2, norm_lo=0.5, norm_hi=2.0
    ).collect()[0]
    assert out.n_vecs == 8
    assert out.n_null == 1
    assert out.n_bad_dim == 2          # [1.0] and []
    assert out.n_nonfinite == 2
    assert out.n_zero == 2             # [0,0] and []
    assert out.n_norm_lo == 2          # the two zero-norm vectors
    assert out.n_norm_hi == 1          # [3,4]
    assert out.min_norm == 0.0
    assert out.max_norm == 5.0


def test_embedding_quality_ungrouped_no_dim():
    # no spark fixture needed for the signature check; covered above
    pass


def test_tfidf_top_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.doc_id, r.rank): r
        for r in tfidf_top_terms(docs, "text", "doc_id", k=2).collect()
    }
    # doc 1: apple tf=2 df=1 → 2·ln3 ; banana tf=1 df=2 → ln1.5
    r = out[(1, 1)]
    assert r.term == "apple" and r.tf == 2 and r.doc_freq == 1
    assert math.isclose(r.tfidf, round(2 * math.log(3), 6))
    assert out[(1, 2)].term == "banana"
    # doc 2: banana and cherry tie at ln1.5 → term-ascending break
    assert out[(2, 1)].term == "banana"
    assert out[(2, 2)].term == "cherry"
    # doc 3: durian ln3 ≈ 1.099 beats cherry 2·ln1.5 ≈ 0.811
    assert out[(3, 1)].term == "durian"
    assert out[(3, 2)].term == "cherry"
    assert len(out) == 6


def test_embedding_dim_drift_exact(spark):
    rows = [
        (0, [0.5, -0.25], 0),
        (1, [0.5, -0.75], 0),
        (2, [1.0, 1.0], 1),
        (3, [2.0, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, VEC_SCHEMA).withColumnRenamed(
        "vec_id", "vid"
    )
    from check_datapackage_spark.operators.vectors import embedding_dim_drift

    out = {
        (r.label, r.dim): r
        for r in embedding_dim_drift(
            df, "embedding", "label", base_group=0
        ).collect()
    }
    # label 0 dim1 mean 0.5 → 500000; label 1 dim1 mean 1.5 → 1500000
    assert out[(1, 1)].mean_micro == 1_500_000
    assert out[(1, 1)].base_mean_micro == 500_000
    assert out[(1, 1)].shift_micro == 1_000_000
    # dim2: base mean of (-0.25, -0.75) = -0.5 → -500000 (negative
    # half-away path); label 1 mean 0.5 → 500000
    assert out[(1, 2)].base_mean_micro == -500_000
    assert out[(1, 2)].shift_micro == 1_000_000


def test_funnel_counts(spark):
    from check_datapackage_spark.operators.sequences import funnel_counts

    rows = [
        # u1 completes a→b→c in order
        (1, "a", "2024-01-01 00:00:00"),
        (1, "b", "2024-01-01 00:01:00"),
        (1, "c", "2024-01-01 00:02:00"),
        # u2: b BEFORE a — b after-anchor missing → stops at a
        (2, "b", "2024-01-01 00:00:00"),
        (2, "a", "2024-01-01 00:01:00"),
        # u3: a and b simultaneous (ties inclusive) → reaches b
        (3, "a", "2024-01-01 00:00:00"),
        (3, "b", "2024-01-01 00:00:00"),
        # u4: never does a → excluded from step 1
        (4, "b", "2024-01-01 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    ev = ev.withColumn("ts", ev.ts.cast("timestamp"))
    out = {r.step: r for r in funnel_counts(ev, ["a", "b", "c"]).collect()}
    assert out["a"].n_users == 3
    assert out["b"].n_users == 2          # u1 and u3
    assert out["c"].n_users == 1          # u1
    assert out["a"].conversion == 1.0
    assert out["b"].conversion == round(2 / 3, 6)
    assert out["c"].conversion == 0.5


def test_source_overlap_matrix(spark):
    from check_datapackage_spark.operators.dedup import source_overlap_matrix

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six", "s1"),
            (2, "one two three four five seven", "s2"),
            (3, "totally different words here now indeed", "s3"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        (r.src_a, r.src_b): r
        for r in source_overlap_matrix(docs, "text", "source", k=5).collect()
    }
    # s1: shingles {one..five, two..six}; s2: {one..five, two..seven}
    # → 1 shared of min(2,2)
    r = out[("s1", "s2")]
    assert r.n_a == 2 and r.n_b == 2 and r.n_shared == 1
    assert r.overlap == 0.5
    # s3 shares nothing → absent from the matrix
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_ks_drift_exact(spark):
    from check_datapackage_spark.operators.drift import ks_drift_by_group

    rows = [("b", v) for v in (1, 2, 3, 4)] + [("g", v) for v in (3, 4, 5, 6)]
    df = spark.createDataFrame(rows, ["src", "x"])
    out = ks_drift_by_group(df, "x", "src", "b").collect()
    assert len(out) == 1
    r = out[0]
    # ECDFs diverge most at v=2 (0.5 vs 0.0) → KS = 0.5
    assert r.src == "g" and r.n == 4 and r.base_n == 4 and r.ks == 0.5


def test_ks_drift_identical_is_zero(spark):
    from check_datapackage_spark.operators.drift import ks_drift_by_group

    rows = [(s, v) for s in ("b", "g") for v in (1, 1, 2, 5)]
    df = spark.createDataFrame(rows, ["src", "x"])
    r = ks_drift_by_group(df, "x", "src", "b").collect()[0]
    assert r.ks == 0.0


def test_audit_ledger_table_identifier_roundtrip(spark, tmp_path):
    """record_units/completed_units accept a catalog table identifier
    (the Iceberg-on-cluster path) — exercised here against the built-in
    catalog; the parquet-path branch is covered by the resume tests."""
    from check_datapackage_spark.operators.audit import (
        _is_table_ident,
        completed_units,
        record_units,
    )

    assert _is_table_ident("local.audit.ledger")
    assert not _is_table_ident(str(tmp_path / "ledger"))
    assert not _is_table_ident("ledgerdir")

    tbl = "spark_catalog.default.cdp_test_ledger"
    spark.sql("DROP TABLE IF EXISTS " + tbl)
    try:
        units = spark.createDataFrame(
            [("s1", 0, 10, 0), ("s1", 1, 12, 3)],
            "source string, _bucket int, n_rows long, n_violations long",
        )
        record_units(units, tbl, run_id="r1")
        record_units(units.limit(1), tbl, run_id="r2")  # append branch
        done = completed_units(spark, tbl).collect()
        assert {(r.source, r._bucket) for r in done} == {("s1", 0), ("s1", 1)}
        assert spark.read.table(tbl).count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS " + tbl)


def test_ks_drift_bounds_property(spark):
    """KS ∈ [0, 1] and monotone sanity over seeded random groups."""
    import random

    rng = random.Random(7)
    rows = [("b", rng.randrange(20)) for _ in range(300)] + [
        ("g", rng.randrange(10, 30)) for _ in range(300)
    ] + [("h", rng.randrange(20)) for _ in range(300)]
    from check_datapackage_spark.operators.drift import ks_drift_by_group

    df = spark.createDataFrame(rows, ["src", "x"])
    out = {r.src: r.ks for r in ks_drift_by_group(df, "x", "src", "b").collect()}
    assert set(out) == {"g", "h"}
    assert all(0.0 <= v <= 1.0 for v in out.values())
    # g is shifted by construction; h is iid with b → far smaller KS
    assert out["g"] > out["h"]


def test_tfidf_rank1_is_argmax(spark):
    """Property: every doc's rank-1 term attains that doc's max score."""
    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 40))))
        for i in range(40)
    ]
    from check_datapackage_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    allterms = tfidf_top_terms(df, "text", "doc_id", k=1000).collect()
    best = {}
    for r in allterms:
        cur = best.get(r.doc_id)
        if cur is None or r.tfidf > cur:
            best[r.doc_id] = r.tfidf
    for r in allterms:
        if r.rank == 1:
            assert r.tfidf == best[r.doc_id]


def test_range_join_boundaries(spark):
    """[start, end) semantics, cross-bucket intervals, no-match drop."""
    from check_datapackage_spark.operators.asof import range_join

    facts = spark.createDataFrame(
        [
            (1, "k", "2024-01-01 00:00:00"),   # == start → in
            (2, "k", "2024-01-01 01:59:59"),   # inside, 2nd bucket
            (3, "k", "2024-01-01 02:00:00"),   # == end → out
            (4, "k", "2023-12-31 23:59:59"),   # before → out
            (5, "z", "2024-01-01 00:30:00"),   # wrong key → out
        ],
        ["fact_id", "k", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    iv = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", "2024-01-01 02:00:00")],
        ["k", "s", "e"],
    ).select(
        "k",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    got = sorted(
        r.fact_id
        for r in range_join(
            facts, iv, "ts", "s", "e", keys=["k"], bucket_s=3600
        ).collect()
    )
    assert got == [1, 2]


def test_table_ident_path_suffixes_and_prefixes():
    """ADVICE r5: dotted relative paths like 'ledger.parquet' must not
    be inferred as catalog tables; explicit prefixes always win."""
    from check_datapackage_spark.operators.audit import (
        _is_table_ident,
        _strip_prefix,
    )

    assert not _is_table_ident("ledger.parquet")
    assert not _is_table_ident("out.d")
    assert not _is_table_ident("Ledger.PARQUET")
    assert _is_table_ident("local.audit.ledger")
    assert _is_table_ident("table:ledger.parquet")
    assert not _is_table_ident("path:local.audit.ledger")
    assert _strip_prefix("table:a.b") == "a.b"
    assert _strip_prefix("path:/x/y") == "/x/y"
    assert _strip_prefix("a.b") == "a.b"
