"""Connected components: known graphs + union-find equivalence fuzz."""

import random

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.components import (
    connected_components,
    duplicate_clusters,
)


def _uf_components(edges):
    """Reference union-find; returns {node: min-id-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    roots = {}
    for node in list(parent):
        roots.setdefault(find(node), []).append(node)
    out = {}
    for members in roots.values():
        lo = min(members)
        for m in members:
            out[m] = lo
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = connected_components(df).collect()
    return {r["node"]: r["component"] for r in got}


def test_two_chains_and_isolated_pair(spark):
    # chain 1-2-3-4, chain 10-11, pair 20-21 (via reversed edge)
    edges = [(1, 2), (3, 2), (3, 4), (10, 11), (21, 20)]
    assert _run(spark, edges) == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20,
    }


def test_self_loops_and_duplicate_edges_ignored(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (6, 6), (6, 7)]
    got = _run(spark, edges)
    # pure self-loop node 5 contributes no real edge -> dropped entirely
    assert got == {1: 1, 2: 1, 6: 6, 7: 6}


def test_long_chain_converges(spark):
    # diameter 12 > the 3-5 typical rounds; exercises the fixpoint loop
    edges = [(i, i + 1) for i in range(12, 0, -1)]
    got = _run(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == 13


def test_fuzz_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(45)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _uf_components(edges)


def test_duplicate_clusters_canonical_pick(spark):
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (9, 8)], ["id_a", "id_b"]
    )
    rows = {
        r["node"]: r
        for r in duplicate_clusters(pairs).collect()
    }
    assert rows[1]["cluster_id"] == 1 and rows[1]["is_canonical"] == 1
    assert rows[3]["cluster_id"] == 1 and rows[3]["is_canonical"] == 0
    assert rows[3]["cluster_size"] == 3
    assert rows[8]["cluster_id"] == 8 and rows[9]["is_canonical"] == 0
    assert rows[9]["cluster_size"] == 2
    # dropping non-canonical rows keeps exactly one doc per cluster
    kept = [n for n, r in rows.items() if r["is_canonical"] == 1]
    assert sorted(kept) == [1, 8]


def test_connected_components_raises_on_non_convergence(spark):
    """On the distributed path (small-graph fast path disabled), a
    chain deeper than max_iter must raise, not silently return split
    components."""
    import pytest

    from falcon_metrics_etl_spark.operators.components import (
        connected_components,
    )

    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(6)]
    edges = spark.createDataFrame(chain, "src string, dst string")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2, small_graph_edges=0)
    # ...and converges fine with enough rounds
    out = connected_components(edges, max_iter=10, small_graph_edges=0)
    assert {r["component"] for r in out.collect()} == {"n00"}


def test_fast_path_matches_distributed_path(spark):
    """The driver union-find fast path and the distributed fixpoint
    must produce the identical (node, component) labeling — including
    string ids, reversed edges, self-loops and duplicate edges."""
    from falcon_metrics_etl_spark.operators.components import (
        connected_components,
    )

    rng = random.Random(21)
    edges = [
        (rng.randrange(40), rng.randrange(40)) for _ in range(60)
    ] + [(7, 7), (3, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(df, small_graph_edges=0).collect()
    }
    assert fast == dist


def test_null_edge_endpoints_match_distributed_semantics(spark):
    """A null endpoint must vanish on BOTH paths (the distributed
    filter(a != b) drops it via SQL null semantics; the fast path must
    not crash or register it)."""
    from falcon_metrics_etl_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(None, 5), (5, None), (1, 2), (None, None), (2, 3)],
        "src long, dst long",
    )
    fast = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(
            edges, small_graph_edges=0
        ).collect()
    }
    assert fast == dist == {(1, 1), (2, 1), (3, 1)}
