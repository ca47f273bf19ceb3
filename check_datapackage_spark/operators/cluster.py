"""Connected-components clustering of duplicate-pair graphs.

The reference's scope ends at per-row checks (no graph operator), so
this belongs to the training-data-pipeline surface this engine adds
(SURVEY.md §2.8): every near-dup miner here (``minhash_near_dups``,
``simhash_near_dups``, ``cosine_near_dups``) emits PAIRS, but a dedup
pass needs one representative per TRANSITIVE group — i.e. the connected
components of the pair graph. A is near B and B is near C must put
A, B, C in ONE cluster even when (A, C) itself was never emitted; at
web scale a template family easily chains thousands of documents whose
pairwise similarity is only locally above threshold.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, *Connected Components in MapReduce
and Beyond*, ACM SoCC 2014) — the shape used by GraphFrames'
``connectedComponents`` and most production dedup pipelines:

* converges in O(log² n) rounds on any graph (2-3 rounds in practice on
  near-dup graphs, whose components are clique-ish with tiny diameter);
* each half-round is ONE shuffle pair — ``groupBy(node).min`` and a
  join back **on the same key**, so the exchange is reused;
* per-node neighborhoods are NEVER materialized as arrays: a
  ``collect_list`` formulation OOMs the executor holding a hub node
  (a boilerplate cluster can have 10⁸ members) — min-aggregate +
  join-back keeps every row O(1) and lets AQE split hot keys;
* each round is ``localCheckpoint()``-ed: iterative plans otherwise
  nest exponentially and Catalyst analysis time, not the data, becomes
  the bottleneck. On a real cluster prefer a reliable
  ``checkpoint()`` (``spark.sparkContext.setCheckpointDir``) so a lost
  executor does not force recomputing all previous rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(e: DataFrame) -> DataFrame:
    """Canonicalize an edge list: undirected, no self-loops, u < v,
    distinct. One shuffle (the distinct)."""
    return (
        e.where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of each node to the
    minimum of its closed neighborhood (SoCC'14 §3, LargeStar)."""
    nbr = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = nbr.groupBy("u").agg(F.min("v").alias("_mn"))
    m = F.least(F.col("u"), F.col("_mn"))
    out = (
        nbr.join(mins, "u")  # same key as the groupBy → exchange reuse
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
    )
    return _canon(out)


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor (and the node itself) to
    the minimum of that set (SoCC'14 §3, SmallStar). With ``e``
    canonical (u < v), a node's smaller neighbors are exactly the u
    column of its incoming edges."""
    le = e.select(F.col("v").alias("n"), F.col("u").alias("nb"))
    mins = le.groupBy("n").agg(F.min("nb").alias("_m"))
    out = (
        le.join(mins, "n")
        .select(F.col("nb").alias("u"), F.col("_m").alias("v"))
        .union(mins.select(F.col("n").alias("u"), F.col("_m").alias("v")))
    )
    return _canon(out)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Label each node of an undirected edge list with the minimum node
    id reachable from it. Output ``(id, component)``; isolated nodes
    (appearing in no edge) are not emitted — union them in as their own
    singleton component if the caller needs total coverage.

    Node ids may be any orderable, hashable column type (long doc ids,
    md5 strings, ...). ``max_iter`` is a safety bound far above the
    O(log² n) convergence guarantee; the loop exits as soon as the edge
    set reaches its fixed point (star graphs rooted at each component
    minimum), detected by a (count, XOR of xxhash64) signature — one
    tiny aggregate per round, no driver-side edge materialization (XOR
    is a sound set signature because the edge set is distinct, and
    unlike a sum it cannot overflow under ANSI mode).
    """
    e = _canon(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint()
    sig_cols = [
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("u", "v")).alias("h"),
    ]
    prev = tuple(e.agg(*sig_cols).first())
    # r6 fast path (guide §1.2 — fix the algorithm before the config):
    # a near-dup pair graph is usually TINY relative to the corpus (the
    # miners emit only violating pairs), and each distributed L/S round
    # costs several scheduled jobs (checkpoint + signature) regardless
    # of size. Below a bounded edge count, union-find on the driver
    # computes the identical min-reachable-id labeling in microseconds
    # — the same bounded-collect pattern as the t-digest/BPE samples.
    # Above the bound, the scale-proof star loop below is unchanged.
    n_edges = prev[0] or 0
    if n_edges <= 65536:
        rows = e.collect()
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for r in rows:
            a, b = find(r[0]), find(r[1])
            if a != b:
                parent[max(a, b)] = min(a, b)
        comp: dict = {}
        for r in rows:
            for node in (r[0], r[1]):
                root = find(node)
                comp[node] = min(comp.get(node, node), root)
        # root ids are already the component minimum: union always
        # points the larger root at the smaller one
        spark = e.sparkSession
        out_schema = (
            e.select(F.col("u").alias("id"), F.col("u").alias("component"))
            .schema
        )
        # Arrow-path createDataFrame: the Python-rows path re-pickles
        # through a Python worker on every downstream action (~0.6 s
        # even for tiny frames). Ids are non-null (edge endpoints), so
        # the pandas conversion is exact for both the int64 and the
        # string id case (object dtype keeps strings as-is).
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        items = sorted(comp.items())
        if isinstance(out_schema["id"].dataType, (T.LongType, T.IntegerType)):
            pdf = pd.DataFrame(
                {
                    "id": np.fromiter(
                        (k for k, _ in items), dtype=np.int64, count=len(items)
                    ),
                    "component": np.fromiter(
                        (v for _, v in items), dtype=np.int64, count=len(items)
                    ),
                }
            )
        else:
            pdf = pd.DataFrame(items, columns=["id", "component"], dtype=object)
        return spark.createDataFrame(pdf, schema=out_schema)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        sig = tuple(e.agg(*sig_cols).first())
        if sig == prev:
            break
        prev = sig
    # converged: every edge is (root, member) with root = component min.
    nbr = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return nbr.groupBy("u").agg(
        F.least(F.col("u"), F.min("v")).alias("component")
    ).select(F.col("u").alias("id"), "component")


def duplicate_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Near-duplicate pair list → ``(id, cluster_id, cluster_size)``,
    ``cluster_id`` = minimum member id (the canonical keep-the-oldest
    representative when ids are ingestion-ordered). Membership is
    transitive closure, so a miner that missed one edge of a clique
    still yields the right cluster as long as a spanning tree of pairs
    survived — which is why clustering belongs AFTER the approximate
    miner rather than inside it.

    The size join is keyed on ``cluster_id``, the same key as the
    groupBy that produced it — one shuffle, reused exchange; sizes are
    |clusters| rows, never broadcast (at 10¹² docs the cluster
    directory itself can exceed driver memory).
    """
    lab = connected_components(pairs, id_a, id_b).withColumnRenamed(
        "component", "cluster_id"
    )
    sizes = lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return lab.join(sizes, "cluster_id").select("id", "cluster_id", "cluster_size")
