"""Snapshot derivation — SURVEY.md W5/W6/W7/W8.

The reference clones the raw item once per revision and overwrites the
changed fields (revision_processor.ts:671-830). In Spark revisions
already ARE rows, so snapshot expansion is a join of item-level columns
onto the revision stream — no cloning.

Flagged-interval propagation (W7) re-expresses
/root/reference/src/jiracloud/process/utils.ts:13-116 as pure window
expressions:

- a FLAGGED row with flagged=true starts an interval; the next FLAGGED
  row with flagged=false ends it (exclusive);
- every row inside the interval gets flagged=true; the unflag row
  keeps false;
- flag/unflag rows inherit state fields from the last preceding
  STATE_CHANGE revision; a flag on the very first revision gets
  stateType='queue'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.event_dates import (
    is_delayed_snapshot,
    point_in_time_state_category,
)
from falcon_metrics_etl_spark.operators.revisions import FLAGGED, STATE_CHANGE

# state fields a flag/unflag revision inherits from the previous
# state_change revision (utils.ts:44-55 copies everything except type,
# flagged, snapshotDate, revision, filler bookkeeping)
INHERITED_FIELDS = ("status_id", "status_name", "state_type", "step_category")


def propagate_flag_intervals(
    snapshots: DataFrame,
    item_col: str = "work_item_id",
    order_cols: tuple = ("revision",),
    inherited_fields: tuple = INHERITED_FIELDS,
) -> DataFrame:
    """W7 — flagged-interval propagation + field inheritance."""
    inherited_fields = tuple(
        c for c in inherited_fields if c in snapshots.columns
    )
    w = Window.partitionBy(item_col).orderBy(*order_cols)
    w_before = w.rowsBetween(Window.unboundedPreceding, -1)
    w_incl = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    is_flag_row = F.col("type") == FLAGGED

    # interval membership: the last flag/unflag value at or before this
    # row decides; the unflag row itself carries false (utils.ts:93-106)
    last_flag_value = F.last(
        F.when(is_flag_row, F.col("flagged")), ignorenulls=True
    ).over(w_incl)
    flagged_out = F.coalesce(last_flag_value, F.lit(False))

    # field inheritance from the last preceding state_change (utils.ts:29-58)
    prev_state = F.last(
        F.when(
            F.col("type") == STATE_CHANGE,
            F.struct(*[F.col(c).alias(c) for c in inherited_fields]),
        ),
        ignorenulls=True,
    ).over(w_before)
    is_first_row = F.row_number().over(w) == 1

    out = snapshots.withColumn("_prev_state", prev_state).withColumn(
        "flagged", flagged_out
    )
    for c in inherited_fields:
        inherited = F.when(
            is_flag_row & F.col("_prev_state").isNotNull(),
            F.col("_prev_state").getField(c),
        ).otherwise(F.col(c))
        out = out.withColumn(c, inherited)
    # first-revision flag edge case: stateType='queue' (utils.ts:86-92)
    if "state_type" in inherited_fields:
        out = out.withColumn(
            "state_type",
            F.when(
                is_flag_row & is_first_row & F.col("_prev_state").isNull(),
                F.lit("queue"),
            ).otherwise(F.col("state_type")),
        )
    return out.drop("_prev_state")


def derive_snapshots(
    tagged_revisions: DataFrame,
    event_dates: DataFrame,
    item_col: str = "work_item_id",
) -> DataFrame:
    """W5/W6/W8 — join per-item event dates back onto the revision
    stream, compute the as-of state category and per-snapshot delay,
    then run flag propagation.

    event_dates is one row per item (output of extract_event_dates):
    Catalyst picks a broadcast or shuffle join by size — both sides are
    already partitioned by the same key at scale.
    """
    enriched = tagged_revisions.join(event_dates, item_col, "left")
    # per-revision step category from the zone: equivalent to the
    # reference's calculateStepCategory against effective point orders,
    # because the effective order of a zone is the min step order inside
    # it — membership is unchanged (process_revision_utils.ts:82-114)
    enriched = enriched.withColumn(
        "step_category",
        F.when(F.col("zone") == 0, F.lit("preceding"))
        .when(F.col("zone") == 1, F.lit("proposed"))
        .when(F.col("zone") == 2, F.lit("inprogress"))
        .when(F.col("zone") == 3, F.lit("completed")),
    )
    enriched = enriched.withColumn(
        "state_category",
        point_in_time_state_category(
            F.col("changed_date"),
            F.col("arrival_date"),
            F.col("commitment_date"),
            F.col("departure_date"),
        ),
    ).withColumn(
        "is_delayed",
        is_delayed_snapshot(F.col("revision"), F.col("delayed_revision")),
    ).withColumn(
        "snapshot_date", F.to_date(F.col("changed_date"))
    )
    return propagate_flag_intervals(enriched, item_col=item_col)
