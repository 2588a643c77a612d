"""Integer PageRank: exact hand-computed ranks on a tiny graph.

The implementation promises bit-identical integer arithmetic
(floor divisions at 10^12 scale), so the test asserts EXACT values,
not tolerances.
"""

from falcon_metrics_etl_spark.plans.graph import pagerank_int


def test_pagerank_int_exact_three_iterations(spark):
    # cycle a->b->c->a plus d->a; every node outdeg 1, d has no inflow
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")],
        "src string, dst string",
    )
    got = {r["node"]: r["rank_scaled"] for r in pagerank_int(edges, 3).collect()}
    # S=10^12, N=4, base=floor(15S/400)=37_500_000_000, damping 85/100
    assert got == {
        "a": 281_875_000_000,
        "b": 277_093_750_000,
        "c": 403_531_250_000,
        "d": 37_500_000_000,
    }


def test_pagerank_mass_conserved_without_dangling(spark):
    # pure cycle: no dangling nodes, so total mass stays within the
    # floor-loss bound (< N per floor op per iteration)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = {r["node"]: r["rank_scaled"] for r in pagerank_int(edges, 3).collect()}
    total = sum(got.values())
    assert abs(total - 10**12) < 100  # floor losses only
    # symmetric cycle => equal ranks
    assert len(set(got.values())) == 1
