"""Training-sequence packing and token-budget mixture selection — the
"assemble the context windows" step of an LLM data pipeline (task
brief; no reference analog — the reference validates tables, it does
not build training batches).

Two operators over a corpus with a per-document token count:

* :func:`pack_sequences` — GPT-style concat-and-chunk packing: within
  each group (``by``, e.g. source or shard), documents are laid out
  back-to-back in a deterministic order and the token stream is cut
  into fixed-length sequences of ``seq_len`` tokens. Emits one row per
  document with its token offset and the sequence ids it spans —
  downstream batch assembly is then a pure partition-local gather.
* :func:`token_budget_mix` — DoReMi-style mixture by TOKEN budget
  rather than row count: per group, documents are taken in a stable
  md5 order until the group's token budget is filled (the document
  crossing the boundary is kept, so every group with data makes
  budget). Membership is a pure function of the rows — repartition-
  proof, resumable, and exactly reproducible in any SQL engine.

Scale shape (100 TB): both operators are ONE hash-shuffle on the group
key plus a partition-local sort — the window runs entirely inside each
group's partition, nothing is collected, and no O(N^2) structure
exists. Packing a 10^12-token corpus per-source is skew-bound by the
largest source; the ``by`` key accepts composite groupings (e.g.
``(source, shard_bucket)`` where shard_bucket = hash(doc_id) % k) to
bound any single window — sequence ids then namespace per shard, which
is exactly how multi-file tokenized shards are written in practice.
Hot-group salting therefore composes with, not against, this operator.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import unit_hash


def word_count(col: Column) -> Column:
    """Whitespace token count (the corpus-side n_tok proxy when no
    pre-tokenized ``tokens`` column exists; empty strings count 0)."""
    return F.size(
        F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != F.lit(""))
    )


def pack_sequences(
    df: DataFrame,
    n_tok_col: str = "n_tok",
    seq_len: int = 2048,
    by: Sequence[str] | str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk packing layout: per ``by`` group, order docs by
    ``order_col``, lay their tokens end-to-end and cut every
    ``seq_len`` tokens.

    Adds to each input row:

    * ``start_tok`` — the doc's first token's offset in its group's
      stream (0-based);
    * ``first_seq`` / ``last_seq`` — the sequence ids the doc spans
      (``floor(start/L)`` .. ``floor((start+n_tok-1)/L)``);
    * ``n_seqs`` — how many sequence boundaries it touches (straddling
      docs are the rows a loader must split or discard).

    Zero-token docs carry ``first_seq = last_seq = NULL`` (they occupy
    no tokens, so they belong to no sequence). One shuffle on ``by``,
    window runs partition-local; see module docstring for the
    hot-group sharding recipe.
    """
    keys = [by] if isinstance(by, str) else list(by)
    # explicit ROWS frame: Spark's default frame under ORDER BY is
    # RANGE, which merges duplicate order_col values into one shared
    # cumulative sum — rows-frame matches the documented concat-and-
    # chunk layout (and the oracle's ROWS UNBOUNDED PRECEDING) even
    # when order_col ties (r4 ADVICE)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.col(n_tok_col).cast("long")
    start = (F.sum(n_tok_col).over(w) - n).cast("long")
    first = F.floor(start / seq_len)
    last = F.floor((start + n - 1) / seq_len)
    has = n > 0
    return (
        df.withColumn("start_tok", start)
        .withColumn("first_seq", F.when(has, first))
        .withColumn("last_seq", F.when(has, last))
        .withColumn(
            "n_seqs", F.when(has, last - first + 1).otherwise(F.lit(0))
        )
    )


def sequence_fill(
    packed: DataFrame,
    n_tok_col: str = "n_tok",
    seq_len: int = 2048,
    by: Sequence[str] | str = "source",
) -> DataFrame:
    """Per-sequence roll-up of :func:`pack_sequences` output: one row
    per (group, seq_id) with the docs touching it and its token fill.

    ``n_docs`` counts documents overlapping the sequence (straddlers
    count in every sequence they touch); ``n_doc_starts`` counts docs
    whose first token lands in it; ``tok_fill`` is the occupied token
    count — ``seq_len`` everywhere except each group's final partial
    sequence. The explode fans a doc out only to the sequences it
    actually spans (≤ ``n_tok/L + 1`` rows), then one agg on
    (group, seq) — still a single logical shuffle chain.
    """
    keys = [by] if isinstance(by, str) else list(by)
    gw = Window.partitionBy(*keys)
    total = F.max(F.col("start_tok") + F.col(n_tok_col).cast("long")).over(gw)
    e = (
        packed.where(F.col("first_seq").isNotNull())
        .withColumn("_total", total)
        .withColumn(
            "seq_id", F.explode(F.sequence("first_seq", "last_seq"))
        )
    )
    seq_start = F.col("seq_id") * seq_len
    return (
        e.groupBy(*keys, "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("start_tok") >= seq_start).cast("long")
            ).alias("n_doc_starts"),
            (
                F.least(F.max("_total"), seq_start + seq_len) - seq_start
            ).alias("tok_fill"),
        )
    )


def token_budget_mix(
    df: DataFrame,
    budgets: Mapping[str, int],
    n_tok_col: str = "n_tok",
    by: str = "source",
    key: str = "doc_id",
    salt: str = "",
    default: Optional[int] = None,
) -> DataFrame:
    """Select documents per group until its TOKEN budget is met.

    Docs are ranked by ``unit_hash(key, salt)`` (stable under
    repartitioning, new draw per ``salt``); a doc is kept iff the
    tokens BEFORE it in that order are still under the group's budget
    — so the budget-crossing doc is included and every non-empty group
    reaches its budget exactly once. Groups without a budget entry use
    ``default`` (``None`` = keep everything — pass-through strata).

    Adds ``_tok_before`` (exclusive running token total) for audit.
    One shuffle on ``by`` + partition-local sort, like packing.
    """
    b: Column = (
        F.lit(None).cast("long")
        if default is None
        else F.lit(int(default)).cast("long")
    )
    for stratum, budget in sorted(budgets.items()):
        b = F.when(F.col(by) == stratum, F.lit(int(budget))).otherwise(b)
    w = (
        Window.partitionBy(by)
        .orderBy(unit_hash(F.col(key), salt), key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (F.sum(n_tok_col).over(w) - F.col(n_tok_col)).cast("long")
    return (
        df.withColumn("_tok_before", before)
        .where(b.isNull() | (F.col("_tok_before") < b))
    )
