"""Seeded-random invariants of packing/sequence_fill/token_budget_mix
(tests/test_fuzz.py pattern: deterministic corpus, whole-property
asserts — catches layout/off-by-one bugs unit fixtures can miss)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from check_datapackage_spark.operators import packing

L = 32


def _random_corpus(spark, seed=7, n=400):
    rng = random.Random(seed)
    rows = [
        (
            i,
            f"s{rng.randrange(4)}",
            # heavy tail + zeros: straddlers, empty docs, >L docs
            rng.choice([0, 1, 2, 5, 13, 31, 32, 33, 100, 257]),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tok int")


def test_pack_and_fill_invariants(spark):
    df = _random_corpus(spark)
    packed = packing.pack_sequences(df, seq_len=L, by="source").cache()
    fill = packing.sequence_fill(packed, seq_len=L, by="source").cache()

    totals = {
        r["source"]: r["tot"]
        for r in df.groupBy("source").agg(F.sum("n_tok").alias("tot")).collect()
    }
    by_src = {
        r["source"]: r
        for r in fill.groupBy("source")
        .agg(
            F.sum("tok_fill").alias("fill_sum"),
            F.max("seq_id").alias("max_seq"),
            F.count(F.lit(1)).alias("n_seqs_rows"),
            F.sum("n_doc_starts").alias("starts_sum"),
            F.sum("n_docs").alias("docs_sum"),
        )
        .collect()
    }
    pk = {
        r["source"]: r
        for r in packed.groupBy("source")
        .agg(
            F.sum("n_seqs").alias("span_sum"),
            F.sum((F.col("n_tok") > 0).cast("long")).alias("n_nonempty"),
        )
        .collect()
    }
    for s, tot in totals.items():
        f = by_src[s]
        n_seq = math.ceil(tot / L)
        # token conservation: fills partition the stream exactly
        assert f["fill_sum"] == tot, s
        # sequence ids are dense 0..ceil(total/L)-1
        assert f["max_seq"] == n_seq - 1 and f["n_seqs_rows"] == n_seq, s
        # every non-empty doc starts in exactly one sequence
        assert f["starts_sum"] == pk[s]["n_nonempty"], s
        # overlap counts are exactly the docs' span counts
        assert f["docs_sum"] == pk[s]["span_sum"], s
    # no sequence overfills; only a group's last sequence may underfill
    bad = fill.where(
        (F.col("tok_fill") > L)
        | (F.col("tok_fill") <= 0)
    ).count()
    assert bad == 0
    under = fill.where(F.col("tok_fill") < L)
    per_src_under = {
        r["source"]: r["c"]
        for r in under.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert all(c == 1 for c in per_src_under.values())
    packed.unpersist()
    fill.unpersist()


def test_token_budget_invariants(spark):
    df = _random_corpus(spark, seed=11)
    budgets = {"s0": 500, "s1": 0, "s2": 10_000_000}
    kept = packing.token_budget_mix(df, budgets, default=50).cache()
    got = {
        r["source"]: r
        for r in kept.groupBy("source")
        .agg(F.sum("n_tok").alias("tok"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    totals = {
        r["source"]: r["tot"]
        for r in df.groupBy("source").agg(F.sum("n_tok").alias("tot")).collect()
    }
    # budget 0 drops the stratum entirely
    assert "s1" not in got
    # a budget above the stratum total keeps the whole stratum
    assert got["s2"]["tok"] == totals["s2"]
    assert got["s2"]["n"] == df.where("source = 's2'").count()
    # otherwise the budget is reached but not by more than one doc's
    # worth: removing the LAST kept doc (max _tok_before) drops below
    assert got["s0"]["tok"] >= 500
    last_before = (
        kept.where("source = 's0'").agg(F.max("_tok_before")).collect()[0][0]
    )
    assert last_before < 500
    kept.unpersist()
