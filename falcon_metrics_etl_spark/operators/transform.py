"""The main silver transform: raw work items + revision histories +
workflow config -> ``states`` (one row per item) and ``snapshots`` (one
row per revision) — the Spark re-expression of the reference's
extract->process_revisions->load pipeline (SURVEY.md section 3.1).

All four of the reference's process boundaries (SNS/S3/SQS/Postgres)
collapse into DataFrame lineage:

    revisions --(synthesize rev 0)--> tag zones --(applyInPandas)-->
    event dates --> states MERGE
                +-> snapshots (as-of category, flag propagation) MERGE

Scale design: config dims broadcast; the only wide shuffles are the
groupBy(work_item_id) for event dates and the window for flag
propagation — both on the natural key, reusable across the two
outputs. States/snapshots are partitioned by (org_id, snapshot month)
at the write layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.event_dates import (
    effective_point_orders,
    extract_event_dates,
    extract_event_dates_expr,
    state_category_from_dates,
    step_category,
    tag_zones,
)
from falcon_metrics_etl_spark.operators.revisions import (
    synthesize_initial_revision,
)
from falcon_metrics_etl_spark.operators.snapshots import derive_snapshots

UNMAPPED_STEP_ORDER = 9999  # src/common/unmapped_workflow_step.ts:87-105


def auto_map_unmapped_steps(
    revisions: DataFrame, workflow_steps: DataFrame
) -> DataFrame:
    """Steps that appear in revision history but not in the workflow
    config get appended with order 9999 / stateType 'queue'
    (src/common/unmapped_workflow_step.ts:76-118, 141-205) so they fall
    into the departure zone instead of being invisible."""
    seen = revisions.select(
        "workflow_id",
        F.col("status_id").alias("step_id"),
        F.col("status_name").alias("step_name"),
    ).dropDuplicates()
    known = workflow_steps.select("workflow_id", "step_id", "step_name")
    unmapped = seen.join(
        known, ["workflow_id", "step_id", "step_name"], "left_anti"
    ).select(
        "workflow_id",
        "step_id",
        "step_name",
        F.lit(UNMAPPED_STEP_ORDER).alias("step_order"),
        F.lit("queue").alias("state_type"),
        F.lit(None).cast("string").alias("state_category"),
        F.lit(True).alias("active"),
    )
    return workflow_steps.unionByName(unmapped, allowMissingColumns=True)


def transform_work_items(
    work_items: DataFrame,
    revisions: DataFrame,
    workflow_steps: DataFrame,
    workflow_events: DataFrame,
    auto_map: bool = True,
    use_expr_event_dates: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Full pipeline. Inputs carry work_item_id + workflow_id; dims are
    small and broadcast. Returns (states, snapshots).

    use_expr_event_dates: the Catalyst-expression W2 (default — stays in
    whole-stage codegen; fuzz-verified equivalent to the pandas UDF
    reference implementation in tests/test_event_dates.py).
    """
    if auto_map:
        workflow_steps = auto_map_unmapped_steps(revisions, workflow_steps)

    full_revisions = synthesize_initial_revision(revisions, work_items)
    tagged = tag_zones(full_revisions, workflow_steps, workflow_events)

    extractor = (
        extract_event_dates_expr if use_expr_event_dates else extract_event_dates
    )
    event_dates = extractor(tagged)

    snapshots = derive_snapshots(tagged, event_dates)

    # current step category: the item's current status vs the workflow's
    # *effective* point orders (recalculated per
    # process_revision_utils.ts:60-80)
    points = effective_point_orders(workflow_steps, workflow_events)
    current_step = workflow_steps.select(
        "workflow_id",
        F.col("step_id").alias("status_id"),
        F.col("step_name").alias("status_name"),
        "step_order",
        F.col("state_type").alias("current_state_type"),
    )
    states = (
        work_items.join(event_dates, "work_item_id", "left")
        .join(F.broadcast(current_step), ["workflow_id", "status_id", "status_name"], "left")
        .join(F.broadcast(points), "workflow_id", "left")
        .withColumn("state_category", state_category_from_dates())
        .withColumn(
            "step_category",
            step_category(
                F.col("step_order").cast("double"),
                F.col("effective_arrival_order"),
                F.col("effective_commitment_order"),
                F.col("effective_departure_order"),
            ),
        )
        .drop(
            "effective_arrival_order",
            "effective_commitment_order",
            "effective_departure_order",
        )
    )
    return states, snapshots
