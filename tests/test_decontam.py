"""Decontamination / repetition / PII operators (operators/decontam.py)
and the q39 token-histogram drift path.

These operators have no reference analog (check-datapackage stops at
descriptor checks); semantics follow the standard training-data
recipes: benchmark n-gram decontamination, Gopher repetition signals,
regex PII redaction. The driver-gate oracles (Q39-Q42_SQL) pin exact
values vs DuckDB; these tests pin the semantics on hand-built rows.
"""

from __future__ import annotations

import hashlib
import sys

import pytest
from pyspark.sql import functions as F

from check_datapackage_spark.operators import decontam, dedup, drift


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---------------------------------------------------------------------------
# contaminated_docs
# ---------------------------------------------------------------------------


def test_contaminated_docs_finds_planted_overlap(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(
        spark,
        [
            # verbatim 5-gram overlap ("the quick brown fox jumps")
            (1, "prefix words the quick brown fox jumps suffix tail"),
            # no 5-gram in common
            (2, "completely different content with no shared phrases at all"),
            # full containment → many shared 5-grams
            (3, "the quick brown fox jumps over the lazy dog indeed"),
        ],
    )
    out = {
        r["doc_id"]: r["n_shared"]
        for r in decontam.contaminated_docs(corpus, bench, n=5).collect()
    }
    assert 1 in out and out[1] >= 1
    assert 2 not in out
    assert 3 in out and out[3] > out[1]


def test_contaminated_docs_counts_distinct_grams(spark):
    bench = _docs(spark, [(0, "a b c d e f")])  # 5-grams: "a b c d e", "b c d e f"
    corpus = _docs(spark, [(1, "a b c d e f"), (2, "x a b c d e")])
    out = {
        r["doc_id"]: r["n_shared"]
        for r in decontam.contaminated_docs(corpus, bench, n=5).collect()
    }
    assert out == {1: 2, 2: 1}


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------


def test_dup_ngram_fraction_extremes(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam spam spam"),  # all 3-grams identical
            (2, "one two three four five six"),  # all distinct
            (3, "ab cd"),  # shorter than n → 0.0
        ],
    )
    out = {
        r["doc_id"]: (r["dup_ngram_frac"], r["top_word_frac"])
        for r in decontam.repetition_profile(df, n=3).collect()
    }
    # 4 total 3-grams, 1 distinct → 0.75; top word 6/6
    assert out[1] == (0.75, 1.0)
    assert out[2][0] == 0.0
    assert out[2][1] == pytest.approx(1 / 6, abs=1e-6)
    assert out[3][0] == 0.0


def test_top_word_fraction(spark):
    df = _docs(spark, [(1, "a a a b c"), (2, "x y")])
    out = {
        r["doc_id"]: r["top_word_frac"]
        for r in decontam.repetition_profile(df).collect()
    }
    assert out[1] == 0.6
    assert out[2] == 0.5


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_counts_and_redaction(spark):
    text = (
        "mail me at jane.doe+x@example.org from 10.0.0.1 "
        "or call 555-867-5309 ssn 123-45-6789 done"
    )
    df = _docs(spark, [(1, text), (2, "no pii here")])
    out = {r["doc_id"]: r for r in decontam.pii_profile(df).collect()}
    r1 = out[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_phone"], r1["n_ssn"]) == (1, 1, 1, 1)
    r2 = out[2]
    assert (r2["n_email"], r2["n_ipv4"], r2["n_phone"], r2["n_ssn"]) == (0, 0, 0, 0)
    # redaction removes every raw PII string
    red = df.where(F.col("doc_id") == 1).select(
        decontam.redact_pii(F.col("text")).alias("t")
    ).collect()[0]["t"]
    for raw in ["jane.doe+x@example.org", "10.0.0.1", "555-867-5309", "123-45-6789"]:
        assert raw not in red
    assert red.count("[PII]") == 4
    # untouched text's md5 is stable
    assert out[2]["redacted_md5"] == hashlib.md5(b"no pii here").hexdigest()


def test_ssn_and_phone_do_not_cross_match(spark):
    # ssn (3-2-4) must not be eaten by the phone pattern (3-3-4) & v.v.
    df = _docs(spark, [(1, "id 123-45-6789"), (2, "tel 123-456-7890")])
    out = {r["doc_id"]: r for r in decontam.pii_profile(df).collect()}
    assert (out[1]["n_ssn"], out[1]["n_phone"]) == (1, 0)
    assert (out[2]["n_ssn"], out[2]["n_phone"]) == (0, 1)


# ---------------------------------------------------------------------------
# token histogram drift plumbing (q39 path)
# ---------------------------------------------------------------------------


def test_token_histogram_matches_explode(spark):
    df = spark.createDataFrame(
        [("a", list(range(0, 100))), ("a", [5, 5, 5]), ("b", [250, 999])],
        ["source", "tokens"],
    )
    got = {
        (r["source"], r["bucket"]): r["count"]
        for r in drift.token_histogram(
            df, "tokens", vocab=1000, n_buckets=10, by="source"
        ).collect()
    }
    want = {}
    for src, toks in [("a", list(range(100))), ("a", [5, 5, 5]), ("b", [250, 999])]:
        for t in toks:
            k = (src, t // 100)
            want[k] = want.get(k, 0) + 1
    assert got == want


def test_drift_from_histogram_zero_for_identical(spark):
    h = spark.createDataFrame(
        [("a", 0, 10), ("a", 1, 20), ("b", 0, 10), ("b", 1, 20)],
        ["source", "bucket", "count"],
    )
    out = {r["source"]: r for r in drift.drift_from_histogram(h, "source").collect()}
    # both groups equal the global → psi = kl = 0
    for src in ["a", "b"]:
        assert abs(out[src]["kl"]) < 1e-12
        assert abs(out[src]["psi"]) < 1e-12


def test_simhash_signature_matches_pure_python(spark):
    """Pin the exact signature math the Q20 oracle re-implements in SQL:
    md5 word hash (first 8 digest bytes little-endian, 60-bit mask),
    per-bit majority over word occurrences."""
    texts = [
        "the quick brown fox",
        "spam spam spam",
        "one",
        "",
        "Mixed CASE words mixed case",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["_id"]: r["simhash"]
        for r in dedup.simhash_signatures(df).collect()
    }

    def ref_sig(text):
        words = text.lower().split()
        if not words:
            return 0
        ones = [0] * 60
        for w in words:
            v = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
            v &= 0xFFFFFFFFFFFFFFF
            for k in range(60):
                ones[k] += (v >> k) & 1
        return sum(
            1 << k for k in range(60) if 2 * ones[k] > len(words)
        )

    for i, t in enumerate(texts):
        assert got[i] == ref_sig(t), t


# ---------------------------------------------------------------------------
# deterministic sampling / stratified mix (operators/sampling.py)
# ---------------------------------------------------------------------------


def test_deterministic_sample_stable_under_repartition(spark):
    from check_datapackage_spark.operators import sampling

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sorted(
        r["doc_id"]
        for r in sampling.deterministic_sample(df, 0.3, key="doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in sampling.deterministic_sample(
            df.repartition(7), 0.3, key="doc_id"
        ).collect()
    )
    assert a == b and len(a) > 0
    # roughly the requested fraction (md5 is uniform)
    assert 0.25 < len(a) / 2000 < 0.35
    # a different salt draws an independent sample
    c = sorted(
        r["doc_id"]
        for r in sampling.deterministic_sample(df, 0.3, key="doc_id", salt="x").collect()
    )
    assert c != a


def test_stratified_mix_up_and_down(spark):
    from check_datapackage_spark.operators import sampling

    rows = [(i, "a" if i < 1000 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sampling.stratified_mix(df, {"a": 2.5, "b": 0.0}, default=1.0)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert "b" not in counts
    # 2.5x: every 'a' row twice + ~half a third time
    assert 2300 < counts["a"] < 2700
    # _rep enumerates copies 1..n
    reps = out.where(F.col("doc_id") == 0).select("_rep").collect()
    n0 = len(reps)
    assert sorted(r["_rep"] for r in reps) == list(range(1, n0 + 1))
    assert n0 in (2, 3)
