"""Graph analytics over relational edges: fixed-iteration PageRank.

Companion to the connected-components clustering operator
(operators/components.py) — together they cover the two iterative
dataflow shapes a lake-side engine needs (label fixpoint, rank
diffusion). The graph here is the customer->supplier purchase graph
derived from orders ⨝ lineitem.

Determinism across engines: floating-point PageRank sums are
order-dependent, so two engines disagree in the last ulp and
hash-compare fails. This implementation does EVERYTHING in scaled
int64 (rank' = rank * 10^12): per-edge contribution is
floor(rank'/outdeg) (exact), damping is floor(85 * sum / 100)
(exact), the base term is floor(15 * S / (100 * N)) (exact) — every
engine computes bit-identical ranks at every iteration. Dangling
nodes (no out-edges) simply leak rank mass, the common simplified
variant.

Scale notes: each iteration is one equi-join (ranks ⨝ edges on src)
plus one shuffle aggregation on dst — the Pregel message-passing
shape; state is O(V), messages O(E). Iteration count is fixed (3), so
the whole thing is a static Catalyst plan — no driver loop actions,
no lineage blowup. For unbounded convergence loops, checkpoint per
round as connected_components does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.sources import load_table

PR_SCALE = 10**12
PR_ITERS = 3


def pagerank_int(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Fixed-iteration integer PageRank over directed (src, dst) edges.

    Returns (node, rank_scaled) for every node that appears as an
    endpoint; rank_scaled is the 10^12-scaled integer rank.

    Lineage discipline: the edge list feeds nodes, outdeg and every
    iteration's message join — without truncation Catalyst re-plans
    (and re-scans) the whole upstream per reference, and each
    iteration doubles the rank subtree (audited: 44 scans for 3
    iterations). LAZY local checkpoints (eager=False — no job at
    definition time, so the registry's no-action contract holds) pin
    edges and each iteration's ranks to be computed once.
    """
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .dropDuplicates(["node"])
    )
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # N as a broadcast scalar — one row
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = (
        nodes.join(F.broadcast(n_nodes))
        .select(
            "node",
            F.floor(F.lit(PR_SCALE) / F.col("n_nodes"))
            .cast("long")
            .alias("rank_scaled"),
            "n_nodes",
        )
    )
    # r16 optimization (guide §2.4): outdeg is static across
    # iterations, so attach it to the edge list ONCE instead of
    # joining ranks ⨝ outdeg inside every round — one join per
    # iteration removed (3 joins for the registered query), message
    # math unchanged (floor(rank/outdeg) still computed per edge-src
    # after the single ranks ⨝ edges join).
    edges_deg = (
        edges.join(outdeg, edges["src"] == outdeg["node"])
        .select("src", "dst", "outdeg")
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        ranks = ranks.localCheckpoint(eager=False)
        contrib = (
            ranks.join(edges_deg, ranks["node"] == edges_deg["src"])
            .withColumn(
                "msg",
                F.floor(F.col("rank_scaled") / F.col("outdeg")).cast("long"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("msg").alias("inflow"))
        )
        ranks = (
            ranks.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.floor(
                        F.lit(15) * F.lit(PR_SCALE) / (F.lit(100) * F.col("n_nodes"))
                    ).cast("long")
                    + F.floor(
                        F.lit(85) * F.coalesce(F.col("inflow"), F.lit(0)) / F.lit(100)
                    ).cast("long")
                ).alias("rank_scaled"),
                "n_nodes",
            )
        )
    return ranks.select("node", "rank_scaled")


@register(
    "pagerank_purchase_graph",
    doc=f"Integer-exact PageRank ({PR_ITERS} fixed iterations, damping "
    "0.85, 10^12 fixed-point scale) over the customer->supplier "
    "purchase graph (orders ⨝ lineitem, distinct (custkey, suppkey) "
    "edges). Every arithmetic step is exact int64 (floor divisions), "
    "so ranks are bit-identical across engines. Per iteration: one "
    "equi-join on src + one aggregation on dst — the Pregel "
    "message-passing shape, O(V) state and O(E) messages.",
    tags=("graph", "iterative", "pagerank", "join"),
    oracle=f"""
WITH edges AS (
    SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                    's' || CAST(l.l_suppkey AS VARCHAR) AS dst
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
nodes AS (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
deg AS (
    SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src
),
nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
r0 AS (
    SELECT node, CAST(FLOOR({PR_SCALE}.0 / n_nodes) AS BIGINT) AS rank_scaled,
           n_nodes
    FROM nodes CROSS JOIN nn
),
c1 AS (
    SELECT e.dst AS node,
           SUM(CAST(FLOOR(CAST(r.rank_scaled AS DOUBLE) / d.outdeg) AS BIGINT))
               AS inflow
    FROM r0 r JOIN deg d ON r.node = d.node
    JOIN edges e ON r.node = e.src
    GROUP BY e.dst
),
r1 AS (
    SELECT r.node,
           CAST(FLOOR(15.0 * {PR_SCALE} / (100.0 * r.n_nodes)) AS BIGINT)
           + CAST(FLOOR(85.0 * COALESCE(c.inflow, 0) / 100.0) AS BIGINT)
               AS rank_scaled,
           r.n_nodes
    FROM r0 r LEFT JOIN c1 c ON r.node = c.node
),
c2 AS (
    SELECT e.dst AS node,
           SUM(CAST(FLOOR(CAST(r.rank_scaled AS DOUBLE) / d.outdeg) AS BIGINT))
               AS inflow
    FROM r1 r JOIN deg d ON r.node = d.node
    JOIN edges e ON r.node = e.src
    GROUP BY e.dst
),
r2 AS (
    SELECT r.node,
           CAST(FLOOR(15.0 * {PR_SCALE} / (100.0 * r.n_nodes)) AS BIGINT)
           + CAST(FLOOR(85.0 * COALESCE(c.inflow, 0) / 100.0) AS BIGINT)
               AS rank_scaled,
           r.n_nodes
    FROM r1 r LEFT JOIN c2 c ON r.node = c.node
),
c3 AS (
    SELECT e.dst AS node,
           SUM(CAST(FLOOR(CAST(r.rank_scaled AS DOUBLE) / d.outdeg) AS BIGINT))
               AS inflow
    FROM r2 r JOIN deg d ON r.node = d.node
    JOIN edges e ON r.node = e.src
    GROUP BY e.dst
),
r3 AS (
    SELECT r.node,
           CAST(FLOOR(15.0 * {PR_SCALE} / (100.0 * r.n_nodes)) AS BIGINT)
           + CAST(FLOOR(85.0 * COALESCE(c.inflow, 0) / 100.0) AS BIGINT)
               AS rank_scaled
    FROM r2 r LEFT JOIN c3 c ON r.node = c.node
)
SELECT node, rank_scaled FROM r3
""",
)
def pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
    )
    return pagerank_int(edges, PR_ITERS)
