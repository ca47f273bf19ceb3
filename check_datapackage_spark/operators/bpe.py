"""Iterative BPE-style merge training over a document corpus — the
N-round generalization of q54's single-merge counting
(text.bigram_stats counts the FIRST merge; a tokenizer build needs the
loop).

Word-level BPE: each round finds the globally most frequent adjacent
token pair and fuses it into one token everywhere, exactly the
merge-table construction of byte/word-pair tokenizers (the reference
has no tokenizer — this is data-plane scope the north star's
pre-tokenized tables presuppose).

Scale shape per round: ONE shuffle (the pair-count groupBy with
map-side combine — identical shape to text.bigram_stats); the winning
pair is a 1-row collect (bounded driver traffic, like the IVF
training sample); the merge itself is an Arrow-batched pandas UDF
applied map-side (a linear array rewrite per document — no shuffle);
and the lineage is truncated every round with localCheckpoint (the
same guard operators/cluster.py uses) so N rounds never build an
N-deep plan. Driver state is the merge table: n_merges tuples.

Determinism: ties break (count DESC, pair-a DESC, pair-b DESC) —
stable under any partitioning, same convention as bigram_stats.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _adjacent_pairs(toks: DataFrame) -> DataFrame:
    """(a, b) rows for every adjacent token pair; docs shorter than 2
    tokens contribute nothing. size>=2 guard keeps sequence() ascending
    (sequence(1, 0) in Spark is DESCENDING, not empty)."""
    return (
        toks.where(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(toks[i - 1] AS a, toks[i] AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )


def _merge_udf(a: str, b: str):
    merged = f"{a} {b}"

    @F.pandas_udf("array<string>")
    def apply(s: pd.Series) -> pd.Series:
        def m(tokens):
            out = []
            i, n = 0, len(tokens)
            while i < n:
                if i + 1 < n and tokens[i] == a and tokens[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(tokens[i])
                    i += 1
            return out

        return s.apply(m)

    return apply


def bpe_train(
    df: DataFrame,
    col: str = "text",
    n_merges: int = 10,
    min_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` word-pair merges from the corpus.

    Returns ``(merges, tokenized)``: the ordered merge table
    ``[(a, b, count), ...]`` and the corpus tokenized WITH the merges
    applied (column ``toks: array<string>``; merged tokens join their
    parts with a single space). Stops early when no pair reaches
    ``min_count``.
    """
    words = F.filter(
        F.split(F.lower(F.col(col)), r"\s+"), lambda w: w != F.lit("")
    )
    toks = df.select(words.alias("toks")).where(F.size("toks") > 0)
    toks = toks.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _adjacent_pairs(toks)
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.desc("a"), F.desc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        toks = toks.select(
            _merge_udf(a, b)(F.col("toks")).alias("toks")
        ).localCheckpoint(eager=True)
    return merges, toks


def bpe_apply(
    df: DataFrame,
    merges: list,
    col: str = "text",
    out_col: str = "toks",
) -> DataFrame:
    """Tokenize with a learned merge table: whitespace-split, then
    apply every merge IN TRAINING ORDER (BPE inference semantics).
    One Arrow-batched map-side pass — the merge table ships in the
    UDF closure (n_merges tuples, never data), so at any corpus size
    this is shuffle-free."""
    pairs = [(a, b) for a, b, *_ in merges]

    @F.pandas_udf("array<string>")
    def apply(s: pd.Series) -> pd.Series:
        def tok(text):
            toks = [w for w in str(text).lower().split() if w]
            for a, b in pairs:
                merged, out, i, n = f"{a} {b}", [], 0, len(toks)
                while i < n:
                    if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                toks = out
            return toks

        return s.apply(tok)

    return df.withColumn(out_col, apply(F.col(col)))
