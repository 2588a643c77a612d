"""Connected components over an edge list — the clustering step a
dedup pipeline needs between "candidate pairs" and "keep one doc per
duplicate group" (BASELINE north-star op; no reference twin — the
closest reference shape is the linked-items edge table,
src/jiracloud/process/translate_linked_items.ts:3-42, which this
operator turns into item clusters).

Algorithm: iterative min-label propagation (a Pregel-style fixpoint,
the same scheme GraphX's ``connectedComponents`` uses):

    label(v) <- min(label(v), min over neighbours u of label(u))

repeated until no label changes. Each iteration is one shuffle
(edge-join + groupBy min); the loop converges in O(diameter)
iterations. Duplicate clusters in a corpus are overwhelmingly small
and star-shaped (diameter 2-4), so in practice this runs 3-5 rounds
regardless of corpus size — the per-round cost scales with |E|, not
|V|^2. For adversarial long-chain graphs the known upgrade is the
alternating large-star/small-star algorithm (Kiveris et al., "CC in
MapReduce and Spark"), which converges in O(log n) rounds with the
same per-round join shape; min-propagation is kept here because its
per-round cost is lower and dedup graphs are shallow.

Scale notes:
- ``localCheckpoint`` after every round truncates the lineage — an
  unbounded iterative plan otherwise re-executes all prior rounds on
  every action and overwhelms the driver with plan growth.
- The convergence probe is ``isEmpty`` on changed labels (a LIMIT-1
  scan, cheap under AQE), not a full count.
- Labels are (node, label) pairs only — state is O(|V|), never
  materialised per-edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Edge-count bound for the driver-side fast path. Below it, the graph
# is collected (two longs per edge — a few MB at the bound) and solved
# with union-find in O(E a(E)); above it, the distributed fixpoint
# runs. The cutover exists because each propagation round is 2+ small
# jobs whose FIXED overhead dominates at delta-batch scale — a
# streaming tick's delta-touching subgraph is bounded by the batch, so
# ticks practically always take the fast path, while a full-corpus
# closure at production scale exceeds the bound and stays distributed.
# Both paths produce the identical labeling (min reachable node id).
SMALL_GRAPH_EDGES = 1 << 17


def _unionfind_min_labels(rows) -> list:
    """Union-find with union-by-min-root: attaching the larger root
    under the smaller keeps every root the MINIMUM id of its
    component — the same canonical label the distributed fixpoint
    converges to. Self-loops are skipped entirely (the distributed
    path filters a == b before building labels, so a node appearing
    ONLY in self-pairs gets no row there either)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        # skip self-loops AND null endpoints: the distributed path's
        # filter(a != b) drops null-endpoint rows via SQL null
        # comparison semantics, so the fast path must not register
        # them either (and None is unorderable against ids)
        if a is None or b is None or a == b:
            continue
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return [(n, find(n)) for n in parent]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Cluster an undirected edge list into connected components.

    Returns one row per distinct node: (node, component) where
    ``component`` is the minimum node id reachable from ``node`` —
    a deterministic canonical label.

    Graphs with at most ``small_graph_edges`` edges are solved exactly
    on the driver (union-find; see SMALL_GRAPH_EDGES) — pass 0 to
    force the distributed fixpoint. On the distributed path, raises
    RuntimeError if ``max_iter`` rounds pass without convergence
    (graph diameter > max_iter): silently returning SPLIT components
    would let duplicates survive a dedup prune with no signal. Raise
    max_iter, or switch to the large-star/small-star scheme (module
    docstring) for adversarially deep graphs.
    """
    # checkpoint the base edge list FIRST: the size probe and (on the
    # distributed path) the self-union would otherwise each re-execute
    # the child, which is typically an expensive candidate-pair plan
    # (LSH join / blocked matmul) whose shuffle map stages run fully
    # even under a LIMIT — a small graph pays one extra cheap job for
    # the checkpoint, a large graph avoids a near-full double execution
    e0 = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint()
    probe = (
        e0.limit(small_graph_edges + 1).collect()
        if small_graph_edges > 0
        else None
    )
    if probe is not None and len(probe) <= small_graph_edges:
        from pyspark.sql.types import StructField, StructType

        id_type = e0.schema["a"].dataType
        # broadcast HINT on the fast-path labels (r16 optimization):
        # the frame is driver-built and provably bounded — at most
        # 2 * small_graph_edges (node, component) pairs, a few MB at
        # the default bound — but it is RDD-backed, so the planner has
        # no size estimate and every consumer join planned a
        # SortMergeJoin with an Exchange+Sort on BOTH sides (the r16
        # baseline plans of the whole *_keep_best family carried
        # exactly that shape). The hint turns those into broadcast
        # hash joins: the corpus side is no longer shuffled at all.
        # Scale-safe by construction: the bound is enforced at runtime
        # by the collect probe — a graph past the bound takes the
        # distributed fixpoint below and gets NO hint.
        return F.broadcast(
            edges.sparkSession.createDataFrame(
                _unionfind_min_labels((r[0], r[1]) for r in probe),
                StructType(
                    [
                        StructField("node", id_type, False),
                        StructField("component", id_type, False),
                    ]
                ),
            )
        )
    e = (
        e0.unionByName(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("a").alias("node"))
        .dropDuplicates(["node"])
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        neighbour_min = (
            e.join(labels, e["a"] == labels["node"])
            .select(F.col("b").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("neighbour_component"))
        )
        merged = (
            labels.join(neighbour_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbour_component"), F.col("component")),
                ).alias("new_component"),
                F.col("component").alias("old_component"),
            )
            .localCheckpoint()
        )
        converged = merged.filter(
            F.col("new_component") < F.col("old_component")
        ).isEmpty()
        labels = merged.select(
            "node", F.col("new_component").alias("component")
        )
        if converged:
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); labels would be split"
        )
    return labels


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs -> per-node cluster assignment + canonical pick.

    Output: (node, cluster_id, cluster_size, is_canonical) — one row
    per node that appears in a pair. ``cluster_id`` is the min node id
    of the component; the canonical (kept) document is the one whose
    id equals the cluster id, so "drop duplicates" is
    ``filter(is_canonical == 0)`` against the corpus.
    """
    comp = connected_components(pairs, src=id_a, dst=id_b)
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node"),
        F.col("component").alias("cluster_id"),
        F.count(F.lit(1)).over(w).cast("int").alias("cluster_size"),
        (F.col("node") == F.col("component")).cast("int").alias("is_canonical"),
    )
