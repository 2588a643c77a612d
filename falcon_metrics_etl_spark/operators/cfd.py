"""Cumulative flow diagram (CFD) aggregate — SURVEY.md A1.

Semantics from the reference's serving query
(/root/reference/aurora/ddl/calculate_cfd.sql:18-70):

- completed branch: count per (state, day), then a running cumulative
  sum per state ordered by day;
- in-progress branch: plain count per (state, day);
- UNION of the two.

Spark shape (r8 fused form): ONE conditional groupBy computes the
completed and in-progress daily counts in the same (state, day)
rollup, one window cumulative sum runs over that shared grid, and the
two output branches are filters of the same subtree — 2 shuffles
total (rollup + window re-key), where the original two-filtered-
branches shape paid 4-5. Cumsum equivalence: summing the conditional
completed count over ALL (state, day) grid rows equals the cumsum
over completed-only days at every kept row (non-completed days
contribute 0), so filtering ``_c_cnt > 0`` AFTER the window emits
exactly the original rows. At scale the groupBy pre-aggregates
map-side, so the shuffle carries one row per (state, day) rather
than one per snapshot; the window runs over the tiny aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cumulative_flow(
    snapshots: DataFrame,
    state_col: str = "state",
    date_col: str = "snapshot_date",
    category_col: str = "state_category",
    completed_value: str = "completed",
    inprogress_value: str = "inprogress",
    completed_label: str | None = None,
    inprogress_label: str | None = None,
) -> DataFrame:
    """CFD over a snapshots-like frame with (state, date, category) columns.

    ``category_col`` may be a RAW source column (e.g. a status code)
    with ``*_value`` the codes and ``*_label`` the emitted category
    names: filtering on the raw column keeps the predicate a plain
    EqualTo that parquet pushdown accepts, where filtering on a derived
    CASE expression compiles to a null-safe <=> that cannot push.
    """
    completed_label = completed_label or completed_value
    inprogress_label = inprogress_label or inprogress_value
    base = snapshots.select(
        F.col(state_col).alias("state"),
        F.to_date(F.col(date_col)).alias("snapshot_date"),
        F.col(category_col).alias("state_category"),
    )

    daily = (
        base.filter(
            F.col("state_category").isin(completed_value, inprogress_value)
        )
        .groupBy("state", "snapshot_date")
        .agg(
            F.sum(
                F.when(F.col("state_category") == completed_value, 1)
                .otherwise(0)
            ).alias("_c_cnt"),
            F.sum(
                F.when(F.col("state_category") == inprogress_value, 1)
                .otherwise(0)
            ).alias("_i_cnt"),
        )
    )
    cum_window = (
        Window.partitionBy("state")
        .orderBy("snapshot_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = daily.withColumn("_c_cum", F.sum("_c_cnt").over(cum_window))
    # emit both branches from the SAME subtree via a conditional
    # array + explode instead of a union of two filters: column
    # pruning would otherwise split the shared rollup back into
    # per-branch aggregates (each union branch references only its own
    # count column, so Catalyst specializes — and duplicates — the
    # whole aggregate+window). Generate preserves partitioning, so
    # this stays a 2-shuffle plan.
    return _explode_branches(
        with_cum, completed_label, F.col("_c_cum"), inprogress_label
    )


def _explode_branches(
    with_cum: DataFrame,
    completed_label: str,
    completed_count: Column,
    inprogress_label: str,
) -> DataFrame:
    """(state, day, _c_cnt, _i_cnt, cum) grid -> the CFD union shape,
    one output row per branch with a positive daily count."""
    branch = F.explode(
        F.concat(
            F.when(
                F.col("_c_cnt") > 0,
                F.array(
                    F.struct(
                        F.lit(completed_label).alias("state_category"),
                        completed_count.cast("long").alias("item_count"),
                    )
                ),
            ).otherwise(F.expr(
                "CAST(array() AS array<struct<state_category:string,"
                "item_count:bigint>>)"
            )),
            F.when(
                F.col("_i_cnt") > 0,
                F.array(
                    F.struct(
                        F.lit(inprogress_label).alias("state_category"),
                        F.col("_i_cnt").cast("long").alias("item_count"),
                    )
                ),
            ).otherwise(F.expr(
                "CAST(array() AS array<struct<state_category:string,"
                "item_count:bigint>>)"
            )),
        )
    )
    return with_cum.select(
        "state", "snapshot_date", branch.alias("_b")
    ).select(
        "state",
        "snapshot_date",
        F.col("_b.state_category").alias("state_category"),
        F.col("_b.item_count").alias("item_count"),
    )


def maintain_cfd(
    gold: DataFrame,
    delta_snapshots: DataFrame,
    state_col: str = "state",
    date_col: str = "snapshot_date",
    category_col: str = "state_category",
    completed_value: str = "completed",
    inprogress_value: str = "inprogress",
    completed_label: str | None = None,
    inprogress_label: str | None = None,
) -> DataFrame:
    """Incremental CFD maintenance: fold a NEW-period delta into an
    existing gold CFD **without touching raw history** — the
    incremental-view-maintenance shape the 100 TB serving layer needs
    (the reference recomputes calculate_cfd.sql per request; at scale
    the gold table is maintained, not rebuilt).

    Contract: every delta day is strictly AFTER the gold table's
    horizon — the append-window/watermark case that covers scheduled
    micro-batches. Out-of-window late data goes through the
    recompute-changed-items path instead (streaming/incremental.py),
    exactly like every other late-data case in this engine (ST3).

    Work is O(|delta| + |states|): the completed branch's per-state
    offset is an aggregate of the GOLD table (cum is nondecreasing, so
    max == last), and the only window runs over the delta's
    (state, day) aggregate. The raw base history is never read.
    """
    completed_label = completed_label or completed_value
    inprogress_label = inprogress_label or inprogress_value
    base = delta_snapshots.select(
        F.col(state_col).alias("state"),
        F.to_date(F.col(date_col)).alias("snapshot_date"),
        F.col(category_col).alias("state_category"),
    )

    # per-state offsets: filtering the gold union on its literal
    # category column lets the optimizer prune the in-progress child
    # (the literal predicate folds to false there), so when gold is
    # itself a cumulative_flow plan this aggregate rides the completed
    # branch's window partitioning / exchange reuse
    offsets = (
        gold.filter(F.col("state_category") == completed_label)
        .groupBy("state")
        .agg(F.max("item_count").alias("_prior_cum"))
    )
    # same fused single-rollup shape as cumulative_flow: one
    # conditional (state, day) aggregate feeds both delta branches
    daily = (
        base.filter(
            F.col("state_category").isin(completed_value, inprogress_value)
        )
        .groupBy("state", "snapshot_date")
        .agg(
            F.sum(
                F.when(F.col("state_category") == completed_value, 1)
                .otherwise(0)
            ).alias("_c_cnt"),
            F.sum(
                F.when(F.col("state_category") == inprogress_value, 1)
                .otherwise(0)
            ).alias("_i_cnt"),
        )
    )
    cum_window = (
        Window.partitionBy("state")
        .orderBy("snapshot_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = daily.join(F.broadcast(offsets), "state", "left").withColumn(
        "_c_cum",
        F.sum("_c_cnt").over(cum_window)
        + F.coalesce(F.col("_prior_cum"), F.lit(0)),
    )
    new_rows = _explode_branches(
        with_cum, completed_label, F.col("_c_cum"), inprogress_label
    )
    return gold.unionByName(new_rows)
