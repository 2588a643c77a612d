"""Incremental batch runner: recompute-changed-items-only — ST3.

The reference's key simplification (SURVEY.md ST3): whenever an item
changes, its **whole history** is re-fetched and every derived value is
recomputed from scratch (revision_processor.ts:224-334 always rebuilds
from the complete changelog). Late or out-of-order revisions therefore
need no incremental window state at all — the engine mirrors this:

1. P1 incremental predicate: items with ``updated > cursor``
   (jc_issue.ts:734-776) — a partition-prunable scan, never a full read.
2. Semi-join the *full* revision history of just those items
   (per-item history is small, ~10^2-10^3 rows, so this is the cheap
   side of the trade).
3. Run the supplied transform on those complete histories.
4. MERGE the outputs (idempotent, ST2) and advance the cursor (ST1).

At 100 TB the semi-join is the only shuffle, keyed on work_item_id;
with the revisions table bucketed on work_item_id it degrades to a
co-located join with no shuffle at all.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.sinks.merge import merge_upsert
from falcon_metrics_etl_spark.streaming.cursors import advance_cursor, load_cursor


def run_incremental_batch(
    spark: SparkSession,
    revisions: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    sink_path: str,
    sink_keys: Sequence[str],
    cursor_path: str,
    org_id: str = "default",
    datasource_id: str = "default",
    item_col: str = "work_item_id",
    updated_col: str = "updated",
    partition_cols: Optional[Sequence[str]] = None,
    stats_out: Optional[dict] = None,
    versioned: bool = False,
) -> int:
    """One incremental tick. Returns the number of changed items.

    Pass ``stats_out={}`` to receive the run's observability counters
    (rows_written, updated_min/max of the delta) — the Spark-native
    form of the reference's per-run stats sets
    (extract_state_processor.ts:415, 444-445, 489): ``Observation``
    metrics piggyback on the write action itself, costing no second
    pass over the data. stats_out additionally carries the per-run
    whale telemetry (``max_history_len`` / ``n_whales`` /
    ``n_null_key_whales``), which DOES run a second aggregate action —
    over the persisted histories frame, so it replays the cached
    semi-join rather than re-scanning the revisions source: the
    data-model bound the expr path relies on (histories ~10^2-10^3
    revisions; SCALE.md) is MONITORED every tick rather than assumed —
    routing stays off, the counters are how a violation surfaces.

    ``versioned=True`` routes the MERGE through the versioned snapshot
    sink (sinks/versioned.py): every tick commits an immutable,
    time-travelable version — rollback undoes a bad batch in O(1).
    """
    cursor = load_cursor(spark, cursor_path, org_id, datasource_id)
    delta = revisions
    if cursor is not None:
        delta = revisions.filter(F.col(updated_col) > F.lit(cursor))

    # persist the delta and id set: the tick takes several actions
    # (merge's touched-partition collect + stage write, the stats
    # bounds, the cursor max, the changed count) and an UNCACHED
    # lineage would re-scan the source per action — and worse, a
    # non-snapshot-stable source (view/JDBC/re-listed path) could
    # yield rows in the cursor max that the merge pass never saw,
    # silently skipping them forever once the cursor passes them.
    # The cache pins one consistent snapshot for the whole tick.
    delta = delta.persist()
    changed_ids = delta.select(item_col).distinct().persist()
    histories = None
    try:
        n_changed = changed_ids.count()
        if n_changed == 0:
            return 0

        # full history of changed items only (ST3 recompute-on-arrival)
        histories = revisions.join(
            changed_ids, on=item_col, how="left_semi"
        )
        # when whale telemetry is requested it runs as a second
        # aggregate action over `histories`; persist so that action
        # replays the cached semi-join instead of re-executing the
        # revisions scan + join (the tick otherwise pays a second full
        # pass that grows with history size)
        if stats_out is not None:
            histories = histories.persist()
        out = transform(histories)
        obs: Optional[Observation] = None
        if stats_out is not None:
            obs = Observation("run_stats")
            out = out.observe(obs, F.count(F.lit(1)).alias("rows_written"))
        if versioned:
            from falcon_metrics_etl_spark.sinks.versioned import versioned_merge

            versioned_merge(spark, sink_path, out, sink_keys, partition_cols)
        else:
            merge_upsert(spark, sink_path, out, sink_keys, partition_cols)
        if stats_out is not None and obs is not None:
            stats_out.update(obs.get)
            from falcon_metrics_etl_spark.operators.event_dates import (
                history_length_stats,
            )

            hist_stats = history_length_stats(histories, item_col=item_col)
            stats_out["max_history_len"] = hist_stats["max_history_len"]
            stats_out["n_whales"] = hist_stats["n_whales"]
            stats_out["n_null_key_whales"] = hist_stats["n_null_key_whales"]
            bounds = delta.agg(
                F.min(updated_col).alias("updated_min"),
                F.max(updated_col).alias("updated_max"),
            ).collect()[0]
            stats_out["updated_min"] = bounds.updated_min
            stats_out["updated_max"] = bounds.updated_max
        advance_cursor(
            spark, cursor_path, org_id, datasource_id, delta, updated_col
        )
        return n_changed
    finally:
        if stats_out is not None and histories is not None:
            histories.unpersist()
        changed_ids.unpersist()
        delta.unpersist()
