"""Sequence packing + token-budget mix (operators/packing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from check_datapackage_spark.operators import packing


def _corpus(spark):
    # source A: n_tok 5,3,0,4 / L=4 — hand-packed below
    rows = [
        (1, "A", 5),
        (2, "A", 3),
        (3, "A", 0),
        (4, "A", 4),
        (10, "B", 2),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tok int")


def test_pack_sequences_hand_layout(spark):
    out = {
        r["doc_id"]: r
        for r in packing.pack_sequences(
            _corpus(spark), seq_len=4, by="source"
        ).collect()
    }
    # A stream: d1 tokens [0,5), d2 [5,8), d3 empty, d4 [8,12)
    assert (out[1]["start_tok"], out[1]["first_seq"], out[1]["last_seq"]) == (0, 0, 1)
    assert out[1]["n_seqs"] == 2  # straddles the 4-token boundary
    assert (out[2]["start_tok"], out[2]["first_seq"], out[2]["last_seq"]) == (5, 1, 1)
    # zero-token doc occupies no sequence
    assert out[3]["first_seq"] is None and out[3]["n_seqs"] == 0
    assert (out[4]["first_seq"], out[4]["last_seq"]) == (2, 2)
    assert (out[10]["start_tok"], out[10]["first_seq"]) == (0, 0)


def test_sequence_fill_rollup(spark):
    packed = packing.pack_sequences(_corpus(spark), seq_len=4, by="source")
    fill = {
        (r["source"], r["seq_id"]): r
        for r in packing.sequence_fill(packed, seq_len=4, by="source").collect()
    }
    # A total = 12 tokens → seqs 0,1,2 all full
    a0, a1, a2 = fill[("A", 0)], fill[("A", 1)], fill[("A", 2)]
    assert (a0["n_docs"], a0["n_doc_starts"], a0["tok_fill"]) == (1, 1, 4)
    assert (a1["n_docs"], a1["n_doc_starts"], a1["tok_fill"]) == (2, 1, 4)
    assert (a2["n_docs"], a2["n_doc_starts"], a2["tok_fill"]) == (1, 1, 4)
    # B: one 2-token doc → one partial sequence
    b0 = fill[("B", 0)]
    assert (b0["n_docs"], b0["tok_fill"]) == (1, 2)
    assert len(fill) == 4


def test_pack_single_shuffle(spark):
    """The packing layout costs exactly one Exchange (hash on the
    group key) — the window + derived columns are partition-local."""
    plan = (
        packing.pack_sequences(_corpus(spark), seq_len=4, by="source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_token_budget_mix_semantics(spark):
    df = _corpus(spark)
    kept = packing.token_budget_mix(
        df, {"A": 6, "B": 0}, default=None
    ).collect()
    srcs = {r["source"] for r in kept}
    assert srcs == {"A"}  # B budget 0 → dropped entirely
    # selection follows md5 order; tokens-before-last-kept < 6 and the
    # crossing doc is included → total >= 6 (A has 12 total)
    tot = sum(r["n_tok"] for r in kept)
    assert tot >= 6
    assert all(r["_tok_before"] < 6 for r in kept)


def test_token_budget_mix_repartition_stable(spark):
    """Membership is a pure row function — identical kept set under
    any input partitioning (the q43/q53 determinism contract)."""
    df = _corpus(spark)
    k1 = {
        r["doc_id"]
        for r in packing.token_budget_mix(df, {"A": 6}, default=2).collect()
    }
    k2 = {
        r["doc_id"]
        for r in packing.token_budget_mix(
            df.repartition(7), {"A": 6}, default=2
        ).collect()
    }
    assert k1 == k2


def test_token_budget_mix_default_none_passthrough(spark):
    df = _corpus(spark)
    kept = packing.token_budget_mix(df, {"A": 1}, default=None).collect()
    # B has no budget and default None → whole stratum kept
    assert {r["doc_id"] for r in kept if r["source"] == "B"} == {10}


def test_pack_sequences_duplicate_order_col_rows_frame(spark):
    """Ties in order_col must still get strictly increasing start_tok
    (ROWS frame, r4 ADVICE): the RANGE default would hand every tied
    row the same cumulative sum and overlap their offsets."""
    df = spark.createDataFrame(
        [(1, "s", 5, 0), (2, "s", 5, 0), (3, "s", 5, 0), (4, "s", 5, 1)],
        "doc_id long, source string, n_tok long, ord long",
    )
    out = packing.pack_sequences(
        df, seq_len=4, by="source", order_col="ord"
    ).collect()
    starts = sorted(r["start_tok"] for r in out)
    # 4 docs x 5 tokens laid end-to-end: offsets 0,5,10,15 — no overlap
    assert starts == [0, 5, 10, 15]
