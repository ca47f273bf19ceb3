"""Connected-components duplicate clustering (operators/cluster.py).

No reference analog (check-datapackage stops at descriptor checks);
semantics are the standard post-miner dedup step: transitive closure of
the near-dup pair graph, cluster id = min member. Correctness is pinned
against a pure-Python union-find on deterministic graphs (chains force
multi-round convergence; a hub star exercises the skew path; string ids
exercise the non-numeric ordering path). The q45 driver oracle pins the
end-to-end pipeline against a DuckDB recursive CTE.
"""

from __future__ import annotations

import pytest

from check_datapackage_spark.operators import cluster


def _uf_components(edges):
    """Driver-side union-find ground truth (test-only; tiny graphs)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return sorted((x, find(x)) for x in parent)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = cluster.connected_components(df, **kw).collect()
    return sorted((r.id, r.component) for r in got)


def test_chain_merges_transitively(spark):
    # 1-2-3-4-5 chain: only adjacent pairs are edges, all one component
    edges = [(2, 1), (2, 3), (4, 3), (4, 5)]
    assert _cc(spark, edges) == [(i, 1) for i in range(1, 6)]


def test_two_components_and_dup_edges(spark):
    edges = [(10, 20), (20, 10), (10, 20), (7, 9), (9, 8)]
    assert _cc(spark, edges) == [(7, 7), (8, 7), (9, 7), (10, 10), (20, 10)]


def test_self_loops_dropped(spark):
    assert _cc(spark, [(5, 5), (5, 6)]) == [(5, 5), (6, 5)]


def test_hub_star(spark):
    # one hub connected to 50 leaves: single round, no array blowup
    edges = [(100, i) for i in range(50)]
    got = _cc(spark, edges)
    assert got == [(i, 0) for i in range(50)] + [(100, 0)]


def test_string_ids(spark):
    edges = [("b", "a"), ("c", "b"), ("x", "y")]
    assert _cc(spark, edges) == [
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")]


def test_matches_union_find_on_long_chains(spark):
    # two long chains + a clique + dup/reversed edges: deterministic,
    # needs multiple large/small-star rounds (diameter 20)
    edges = (
        [(i, i + 1) for i in range(0, 20)]
        + [(i + 1, i) for i in range(40, 60)]
        + [(a, b) for a in (70, 71, 72, 73) for b in (70, 71, 72, 73) if a < b]
    )
    assert _cc(spark, edges) == _uf_components(edges)


def test_max_iter_guard_converges_fast(spark):
    # diameter-20 chain must converge well inside the O(log^2 n) bound
    edges = [(i, i + 1) for i in range(0, 20)]
    assert _cc(spark, edges, max_iter=6) == _uf_components(edges)


def test_duplicate_clusters_sizes(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 8)], ["id_a", "id_b"])
    got = sorted(
        (r.id, r.cluster_id, r.cluster_size)
        for r in cluster.duplicate_clusters(pairs).collect()
    )
    assert got == [(1, 1, 3), (2, 1, 3), (3, 1, 3), (8, 8, 2), (9, 8, 2)]
