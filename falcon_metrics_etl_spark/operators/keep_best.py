"""Incremental keep-best resolution — the delta step of quality-scored
dedup (r11 verdict #2): given a batch of NEW docs, the maintained
index of ALL previously processed docs (kept AND dropped, each row
carrying the id of its cluster keeper), and the verified duplicate
edges touching the batch, decide per batch doc keep/drop and which
incumbent keepers the batch DISPLACES — such that the resulting keep
set equals the batch pipeline's connected-components + argmax
keep-best recomputed over the full corpus.

Why this is exact (the IVM argument, relied on by the oracled
``media_keep_best_delta`` / ``video_keep_best_delta`` twins in
plans/media_dedup.py):

- the index holds every processed doc with ``keep_id`` pointing at
  its cluster's current keeper, so mapping a matched old doc to its
  keeper lifts every delta edge onto the keeper graph;
- old clusters are maximal under old-old edges (each doc evaluated
  all its matches when IT was the delta), so a full-corpus cluster is
  exactly (old clusters bridged by delta docs) + (delta docs), and
  its quality argmax is the argmax over {bridging delta docs} ∪
  {bridged clusters' keepers} — precisely the nodes this resolution
  scores;
- connected components over the keeper-lifted delta edges therefore
  reproduce the full-corpus cluster merges, and the per-component
  argmax reproduces the full-corpus keeper.

Displaced keepers must then have every index row pointing at them
REPOINTED to the new winner (the caller's merge step) — that is what
keeps the invariant inductive across ticks.

Scale: every frame here is delta-sized (edges touch the batch by
construction; components run on the delta-touching subgraph only).
The index itself grows with the corpus, not the keep set — the price
of exactness, and the same trade the corpus tick's fp_index makes for
exact-dup canon.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.components import (
    SMALL_GRAPH_EDGES,
    _unionfind_min_labels,
    duplicate_clusters,
)
from falcon_metrics_etl_spark.session import perf_checkpoint


def _admit_all(new_q: DataFrame) -> tuple[DataFrame, DataFrame]:
    """No surviving edges: every batch doc keeps itself, nothing is
    displaced."""
    verdicts = new_q.select(
        "doc_id",
        F.col("doc_id").alias("keep_id"),
        F.lit(True).alias("is_kept"),
    )
    displaced = new_q.sparkSession.createDataFrame(
        [], "doc_id long, new_keep long"
    )
    return verdicts, displaced


def resolve_keep_best(
    new_q: DataFrame,
    idx_q: DataFrame,
    edges: DataFrame,
    quality_cols: Sequence[str],
    bounded_batch: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Resolve one delta batch against the processed-doc index.

    new_q:  (doc_id, *quality_cols) — the batch docs' quality tuples.
    idx_q:  (doc_id, keep_id, *quality_cols) — ALL processed rows
            (kept and dropped; the current batch's own replayed rows
            excluded by the caller), keep_id = cluster keeper. On the
            ``bounded_batch`` path a doc MAY appear on several
            value-identical rows (per-frame index rows) — the bounded
            path dedupes after its endpoint semi-join, so callers
            need not (and should not) pre-shuffle the state to
            dedupe. The default path requires unique doc_id rows.
    edges:  (id_a, id_b) verified duplicate pairs, each touching at
            least one batch doc; either side may be a batch mate or an
            index doc, in either orientation.
    quality_cols: argmax priority order; each compared DESC, with
            doc_id ASC as the final tiebreak.

    Returns (verdicts, displaced):
    - verdicts: (doc_id, keep_id, is_kept) — one row per new_q doc;
      keep_id == doc_id for docs with no surviving match.
    - displaced: (doc_id, new_keep) — incumbent cluster keepers beaten
      by the component winner; the caller must repoint every index row
      whose keep_id is a displaced doc to new_keep and flag the doc.

    ``bounded_batch=True`` declares the delta bounded by a micro-batch
    contract — the streaming ticks' case. The edge plan materializes
    once, the keeper lift restricts the index to edge ENDPOINTS (a
    semi join AQE broadcasts when the endpoint set measures small —
    the common case — and degrades to a shuffle join under hot-bucket
    skew, where the endpoint set is occupancy-bounded rather than
    batch-bounded), and the component solve runs from ONE size-capped
    collect with a distributed-fixpoint fallback past
    SMALL_GRAPH_EDGES lifted edges. Tick cost scales with the delta
    in the common case and stays safe under adversarial skew. The
    delta QUERIES (SF-proportional delta slice) keep the default
    path: their edge volume grows with the corpus.
    """
    comp_bounded = False
    rep = idx_q.select("doc_id", "keep_id")
    if bounded_batch:
        # materialize the caller's edge plan ONCE: the endpoint
        # harvest below scans it twice and the component collect once
        # more — without the checkpoint each scan re-executes the
        # (possibly expensive) candidate-pair lineage
        edges = edges.localCheckpoint(eager=True)
        # no broadcast HINT on ids/rep: the endpoint set is bounded
        # by batch x bucket-occupancy, not by the batch alone (a hot
        # LSH bucket can make it state-proportional), so the join
        # strategy is left to AQE — it broadcasts the post-shuffle
        # stage when it measures small and degrades to a shuffle join
        # when it does not
        ids = (
            edges.select(F.col("id_a").alias("doc_id"))
            .unionByName(edges.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        # dedupe AFTER the endpoint restriction (r16, guide §2.3):
        # bounded callers may pass idx_q with many value-identical
        # rows per doc (the ticks' frame indexes carry one row per
        # (doc, frame_dhash)) — deduping here keeps the shuffle
        # endpoint-sized instead of a state-wide Exchange+HashAgg per
        # tick. Values are identical across a doc's rows by the index
        # append/repoint contract, so the arbitrary pick is
        # value-deterministic; without the dedupe the keeper lift
        # below would multiply edge rows per duplicate.
        rep = rep.join(ids, "doc_id", "left_semi").dropDuplicates(
            ["doc_id"]
        )
    # lift old endpoints to their cluster keepers; batch docs (absent
    # from idx_q) stay themselves. Self-loops (a replayed batch doc
    # matching rows that already point at it) drop out here.
    rep_a = rep.select(
        F.col("doc_id").alias("id_a"), F.col("keep_id").alias("rep_a")
    )
    rep_b = rep.select(
        F.col("doc_id").alias("id_b"), F.col("keep_id").alias("rep_b")
    )
    e = (
        edges.join(rep_a, "id_a", "left")
        .join(rep_b, "id_b", "left")
        .select(
            F.coalesce("rep_a", F.col("id_a")).alias("id_a"),
            F.coalesce("rep_b", F.col("id_b")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    if bounded_batch:
        # ONE size-capped collect serves the empty-graph short
        # circuit AND the component solve (driver union-find) — vs
        # three control jobs (checkpoint, isEmpty, probe) on the
        # general path, which dominate tick latency at micro-batch
        # scale. The cap keeps the path safe under adversarial bucket
        # skew: past SMALL_GRAPH_EDGES lifted edges, the distributed
        # fixpoint takes over instead of an unbounded driver collect.
        probe = e.limit(SMALL_GRAPH_EDGES + 1).collect()
        if not probe:
            return _admit_all(new_q)
        if len(probe) <= SMALL_GRAPH_EDGES:
            # broadcast HINT (r16 optimization): driver-built and
            # bounded by the collect cap (<= 2 * SMALL_GRAPH_EDGES
            # label pairs, a few MB) but RDD-backed, so without the
            # hint the members join below shuffled the UNION of batch
            # and index quality rows — an index-proportional exchange
            # per tick. Broadcasting comp makes that join map-side;
            # the index side is scanned once, never shuffled. A graph
            # past the cap takes the distributed path and no hint.
            comp = F.broadcast(
                new_q.sparkSession.createDataFrame(
                    _unionfind_min_labels((r[0], r[1]) for r in probe),
                    "node long, cluster_id long",
                )
            )
            comp_bounded = True
        else:
            comp = duplicate_clusters(e).select("node", "cluster_id")
    else:
        # materialize the (delta-sized) edge list once: it feeds the
        # empty-graph short circuit AND the component loop. A batch of
        # fresh content has no edges at all — skip the iterative
        # clustering (several jobs) and admit everything.
        e = e.localCheckpoint(eager=True)
        if e.isEmpty():
            return _admit_all(new_q)
        comp = duplicate_clusters(e).select("node", "cluster_id")
    # quality of every component node: batch docs from new_q, keepers
    # from the index; a doc present in both (a re-sent doc in a fresh
    # batch) decodes to identical values, so the dedup pick is safe.
    # The per-doc dedupe runs AFTER the comp join: comp is the
    # delta-touching subgraph (tiny), so joining first restricts the
    # dedupe shuffle to component members instead of re-shuffling the
    # whole maintained index every batch — same rows by the
    # identical-values argument above.
    qual = new_q.select("doc_id", *quality_cols).unionByName(
        idx_q.select("doc_id", *quality_cols)
    )
    members = (
        comp.join(qual, comp["node"] == qual["doc_id"])
        .dropDuplicates(["node"])
        .select("node", "cluster_id", *quality_cols)
    )
    best = F.max(
        F.struct(
            *[F.col(c) for c in quality_cols],
            (-F.col("node")).alias("negid"),
        )
    ).over(Window.partitionBy("cluster_id"))
    # winners is delta-sized (one row per node of the delta-touching
    # subgraph) and feeds BOTH outputs; without the checkpoint,
    # Catalyst inlines the whole members/window subtree once per
    # consumer — the verdicts copy and the displaced copy each carried
    # their own join+window Exchanges (the r13 plan audit's dominant
    # shuffle source on the *_keep_best_delta twins)
    winners = perf_checkpoint(
        members.withColumn("winner", -best.getField("negid")).select(
            "node", "winner"
        )
    )
    if comp_bounded:
        # winners has one row per comp node, so the fast-path bound
        # carries over — hint the verdict/displaced joins broadcast
        # too (the checkpointed frame is RDD-backed: no size estimate)
        winners = F.broadcast(winners)
    verdicts = (
        new_q.select("doc_id")
        .join(
            winners.select(F.col("node").alias("doc_id"), "winner"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("winner", F.col("doc_id")).alias("keep_id"),
            (
                F.coalesce("winner", F.col("doc_id")) == F.col("doc_id")
            ).alias("is_kept"),
        )
    )
    displaced = (
        winners.filter(F.col("node") != F.col("winner"))
        .join(
            new_q.select(F.col("doc_id").alias("node")), "node", "left_anti"
        )
        .select(F.col("node").alias("doc_id"), F.col("winner").alias("new_keep"))
    )
    return verdicts, displaced
