"""Cumulative flow diagram (CFD) aggregate — SURVEY.md A1.

Semantics from the reference's serving query
(/root/reference/aurora/ddl/calculate_cfd.sql:18-70):

- completed branch: count per (state, day), then a running cumulative
  sum per state ordered by day;
- in-progress branch: plain count per (state, day);
- UNION of the two.

Spark shape: two groupBy aggregations + one window cumulative sum +
``unionByName``. At scale the groupBy pre-aggregates map-side
(partial_count), so the shuffle carries one row per (state, day)
rather than one per snapshot; the window then runs over a tiny
aggregate (states x days), so its sort is cheap regardless of input
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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

    completed_daily = (
        base.filter(F.col("state_category") == completed_value)
        .groupBy("state", "snapshot_date")
        .agg(F.count(F.lit(1)).alias("daily_count"))
    )
    cum_window = (
        Window.partitionBy("state")
        .orderBy("snapshot_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    completed = completed_daily.select(
        "state",
        "snapshot_date",
        F.lit(completed_label).alias("state_category"),
        F.sum("daily_count").over(cum_window).alias("item_count"),
    )

    inprogress = (
        base.filter(F.col("state_category") == inprogress_value)
        .groupBy("state", "snapshot_date")
        .agg(F.count(F.lit(1)).alias("item_count"))
        .select(
            "state",
            "snapshot_date",
            F.lit(inprogress_label).alias("state_category"),
            "item_count",
        )
    )
    return completed.unionByName(inprogress)


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

    offsets = (
        gold.filter(F.col("state_category") == completed_label)
        .groupBy("state")
        .agg(F.max("item_count").alias("_prior_cum"))
    )
    cum_window = (
        Window.partitionBy("state")
        .orderBy("snapshot_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    new_completed = (
        base.filter(F.col("state_category") == completed_value)
        .groupBy("state", "snapshot_date")
        .agg(F.count(F.lit(1)).alias("daily_count"))
        .join(F.broadcast(offsets), "state", "left")
        .select(
            "state",
            "snapshot_date",
            F.lit(completed_label).alias("state_category"),
            (
                F.sum("daily_count").over(cum_window)
                + F.coalesce(F.col("_prior_cum"), F.lit(0))
            ).alias("item_count"),
        )
    )
    new_inprogress = (
        base.filter(F.col("state_category") == inprogress_value)
        .groupBy("state", "snapshot_date")
        .agg(F.count(F.lit(1)).alias("item_count"))
        .select(
            "state",
            "snapshot_date",
            F.lit(inprogress_label).alias("state_category"),
            "item_count",
        )
    )
    return gold.unionByName(new_completed).unionByName(new_inprogress)
