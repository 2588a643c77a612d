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

from falcon_metrics_etl_spark.session import perf_checkpoint
from falcon_metrics_etl_spark.operators.event_dates import (
    WHALE_HISTORY_REVISIONS,
    effective_point_orders,
    extract_event_dates,
    extract_event_dates_expr,
    extract_event_dates_routed,
    observe_history_length,
    state_category_from_dates,
    step_category,
    tag_zones,
)
from falcon_metrics_etl_spark.operators.revisions import (
    synthesize_initial_revision,
)
from falcon_metrics_etl_spark.operators.snapshots import derive_snapshots

UNMAPPED_STEP_ORDER = 9999  # src/common/unmapped_workflow_step.ts:87-105

# the Jira-server "Parent Link" roadmaps field id is fixed server-side
# (reference src/jiracloud/process/revision_processor.ts:144)
PARENT_LINK_JIRA_SERVER = "customfield_15503"


def epic_link_field_from_config(custom_field_configs: DataFrame) -> str | None:
    """First epic-type custom-field config's datasource field name —
    the engine side of ``customFieldConfig.getByType('epic')[0]``
    (revision_processor.ts:889-896). Config dims are tiny; this is a
    control-plane read of at most one row, not a data collect."""
    rows = (
        custom_field_configs.filter(F.col("type") == "epic")
        .orderBy("datasource_field_name")
        .select("datasource_field_name")
        .limit(1)
        .collect()
    )
    return rows[0][0] if rows else None


def resolve_parent_id(
    items: DataFrame,
    epic_link_field: str | None = None,
    parent_link_field: str = PARENT_LINK_JIRA_SERVER,
) -> DataFrame:
    """Jira parent/epic resolution (revision_processor.ts:874-898):

    1. ``fields.parent.key`` — Jira cloud parent / sub-task. Presence
       of the parent object decides the branch, exactly like the
       reference's ``if (item.fields.parent)``;
    2. else the Jira-server Parent Link field (roadmaps);
    3. else the org's epic-link custom field (from config).

    Expects an optional ``parent`` struct<key:string> column and an
    optional open-world ``fields`` map<string,string> column (SURVEY
    section 1.2 bronze model). Adds ``parent_id`` (nullable). Empty
    strings in raw fields are treated as absent, mirroring the
    reference's JS truthiness checks. Pure column expressions — stays
    in whole-stage codegen, no shuffle."""
    cols = set(items.columns)
    fallbacks = []
    if "fields" in cols:
        fallbacks.append(F.nullif(F.col("fields")[parent_link_field], F.lit("")))
        if epic_link_field:
            fallbacks.append(F.nullif(F.col("fields")[epic_link_field], F.lit("")))
    fallback = F.coalesce(*fallbacks) if fallbacks else F.lit(None).cast("string")
    if "parent" in cols:
        parent_id = F.when(F.col("parent").isNotNull(), F.col("parent.key")).otherwise(
            fallback
        )
    else:
        parent_id = fallback
    return items.withColumn("parent_id", parent_id)


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
    epic_link_field: str | None = None,
    stats_out: dict | None = None,
    whale_routing: bool = False,
    whale_threshold: int = WHALE_HISTORY_REVISIONS,
) -> tuple[DataFrame, DataFrame]:
    """Full pipeline. Inputs carry work_item_id + workflow_id; dims are
    small and broadcast. Returns (states, snapshots).

    use_expr_event_dates: the Catalyst-expression W2 (default — stays in
    whole-stage codegen; fuzz-verified equivalent to the pandas UDF
    reference implementation in tests/test_event_dates.py).

    whale_routing (DEFAULT OFF, expr path only): items with more than
    whale_threshold revisions are counted EXACTLY (one column-pruned
    aggregate job) and routed to the mapInPandas extractor; the rest
    take the expr path and the branches union
    (extract_event_dates_routed). stats_out additionally receives the
    exact max_history_len / n_revisions / n_whales from that count.
    Off by default because the skew probe MEASURED the routing as a
    net loss: a manufactured 300k-revision item costs the expr path
    1.46x (one serialized JVM window partition) but the pandas
    extractor 27x (Python per-row loop with day-group lookahead), and
    the pandas side also buffers the whole item in Python memory while
    WindowExec spills — see SCALE.md. The guard's default action is
    the exact count telemetry; enable routing only after profiling
    shows YOUR whale distribution behaves differently.

    epic_link_field: the org's epic-link custom field (see
    epic_link_field_from_config). When the work items carry a
    ``parent`` struct or raw ``fields`` map, states get a ``parent_id``
    column via the three-way Jira fallback (resolve_parent_id) —
    ``states.parentId`` feeds portfolio-level lead time in the
    reference (revision_processor.ts:874-898).
    """
    if "parent" in work_items.columns or "fields" in work_items.columns:
        work_items = resolve_parent_id(work_items, epic_link_field)

    full_revisions = synthesize_initial_revision(revisions, work_items)
    # auto-map AFTER synthesis: the synthetic revision 0 carries the
    # item's initial status (first revision's from-status / current
    # status), which never appears in the raw revisions' to-status
    # columns — mapping from the raw stream would leave revision 0
    # unmapped and invisible to event-date extraction
    if auto_map:
        # unmapped detection covers the item's CURRENT status as well
        # as its revisions (getUnmappedWorkflowSteps is called with
        # jcItem.fields.status + revisions, revision_processor.ts:
        # 250-257, unmapped_workflow_step.ts:141-170) — in consistent
        # data the last revision's to-status equals the current status,
        # but stale config or missing changelog entries must still map
        seen_src = full_revisions.select(
            "workflow_id", "status_id", "status_name"
        ).unionByName(
            work_items.select("workflow_id", "status_id", "status_name")
        )
        # materialize the augmented dim once (lazy localCheckpoint, no
        # job at definition): its lineage otherwise drags the full
        # revision stream into each consumer — tag_zones,
        # effective_point_orders and the states current-step join
        # (same fix as operators/kanbanize.py transform_cards)
        workflow_steps = perf_checkpoint(
            auto_map_unmapped_steps(seen_src, workflow_steps)
        )
    tagged = tag_zones(full_revisions, workflow_steps, workflow_events)
    if stats_out is not None:
        # telemetry observation (dense-index alert signal; routing below
        # is exact and count-based, see observe_history_length docstring)
        tagged, stats_out["observation"] = observe_history_length(tagged)

    if use_expr_event_dates and whale_routing:
        event_dates = extract_event_dates_routed(
            tagged, whale_threshold, stats_out=stats_out
        )
    else:
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
