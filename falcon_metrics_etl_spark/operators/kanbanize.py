"""Kanbanize card -> state/snapshot transform — SURVEY.md S5/P6/W10.

Behavioral reference (re-expressed Spark-first, not translated):
/root/reference/src/kanbanize/transform_processor.ts

- identifyWorkflow (ts:93-116): workflow key =
  ``slugify(`${org}.${board_id}.${workflow_name}`).toLowerCase()``;
- identifyWorkflowStep (ts:120-149): the step match requires BOTH the
  column id and the column name (stringified id compare);
- getStateTransitions (ts:293-312): run-length compression — keep a
  transition only when its column_id differs from the previously KEPT
  one, and stamp it with its ORIGINAL array index as ``revision``.
  (First-of-run vs last-kept is equivalent to comparing against the
  immediately preceding raw row, because the previous raw row always
  belongs to the last kept run.)
- transform (ts:402-493): auto-map unmapped steps (order 9999 /
  stateType 'queue'), event dates from the COMPRESSED history,
  type-map skip (isConfiguredCardType ts:385-400: a card whose
  (type_id ?? '0', board_id) has no workItemTypeMap is dropped),
  card -> StandardStateItem (transformCard ts:151-207),
  transitions -> StandardSnapshotItems (transformTransitions
  ts:209-288).
- transformCustomFields (ts:495-511): keep only fields with a display
  value; empty result -> null.

Scale notes: every config dim (steps, events, type maps, types) is
broadcast; the only wide shuffle is the per-card window/aggregation
for compression + event dates — all keyed on card_id, so at 100 TB
the whole transform is one hash-partition of the transition stream.
With the card facts staged through ``stage_card_facts_bucketed``
(co-bucketed on the string card key) even that shuffle disappears:
``transform_cards(..., bucketed_facts=True)`` plans with ZERO
fact-side Exchanges — the ingest-time layout pays the partition once
and every downstream run reads it back aligned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.session import perf_checkpoint
from falcon_metrics_etl_spark.functions.scalar import slugify
from falcon_metrics_etl_spark.operators.event_dates import (
    effective_point_orders,
    extract_event_dates_expr,
    state_category_from_dates,
    step_category,
    tag_zones,
)
from falcon_metrics_etl_spark.operators.snapshots import derive_snapshots
from falcon_metrics_etl_spark.operators.transform import auto_map_unmapped_steps

# r17: the single-exchange card-key fusion engages only above this
# estimated transition-stream size (the r16 mix-gate pattern) — see
# the fuse_key comment in transform_cards.
_CARD_FUSE_CONF = "spark.falconMetricsEtl.cardKeyFuseMinBytes"
_CARD_FUSE_MIN_BYTES_DEFAULT = 256 * 1024 * 1024


def card_workflow_id(org: Column, board_id: Column, workflow_name: Column) -> Column:
    """Workflow key for a card (transform_processor.ts:95-97)."""
    return slugify(F.concat_ws(".", org, board_id.cast("string"), workflow_name))


def compress_transitions(
    transitions: DataFrame,
    card_col: str = "card_id",
    idx_col: str = "idx",
    column_col: str = "column_id",
) -> DataFrame:
    """W10 — keep only column-changing transitions; ``revision`` is the
    original array index (transform_processor.ts:293-312). One window
    over (card, idx): a single shuffle keyed on the card."""
    w = Window.partitionBy(card_col).orderBy(idx_col)
    prev = F.lag(column_col).over(w)
    return (
        transitions.withColumn("_prev_col", prev)
        .filter(F.col("_prev_col").isNull() | (F.col("_prev_col") != F.col(column_col)))
        .drop("_prev_col")
        .withColumn("revision", F.col(idx_col).cast("int"))
    )


def configured_cards(cards: DataFrame, work_item_type_maps: DataFrame) -> DataFrame:
    """P6 — type-map skip: keep only cards whose (type_id ?? '0',
    board_id) has a configured workItemTypeMap
    (findWorkItemTypeMap ts:375-383, isConfiguredCardType ts:385-400).
    Broadcast left-semi join — the map dim is tiny."""
    maps = work_item_type_maps.select(
        F.col("datasource_work_item_id").cast("string").alias("_map_type"),
        F.col("project_id").cast("string").alias("_map_board"),
    ).dropDuplicates()
    type_key = F.coalesce(F.col("type_id").cast("string"), F.lit("0"))
    return cards.join(
        F.broadcast(maps),
        (type_key == F.col("_map_type"))
        & (F.col("board_id").cast("string") == F.col("_map_board")),
        "left_semi",
    )


def transform_card_custom_fields(custom_fields: Column) -> Column:
    """transformCustomFields (ts:495-511): drop entries without a
    display value, rename to the CustomField shape, empty -> null.
    Pure higher-order array functions — no Python in the plan."""
    transformed = F.transform(
        F.filter(custom_fields, lambda cf: cf["display_value"].isNotNull()),
        lambda cf: F.struct(
            cf["field_id"].cast("string").alias("datasource_field_name"),
            cf["display_value"].alias("datasource_field_value"),
            cf["field_name"].alias("display_name"),
            F.lit("string").alias("type"),
        ),
    )
    return F.when(F.size(transformed) > 0, transformed)


def transform_cards(
    cards: DataFrame,
    transitions: DataFrame,
    workflow_steps: DataFrame,
    workflow_events: DataFrame,
    work_item_type_maps: DataFrame,
    work_item_types: DataFrame,
    org_id: str,
    auto_map: bool = True,
    bucketed_facts: bool = False,
    persist_handles: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full Kanbanize transform (transform_processor.ts:402-493).

    cards: card_id, board_id, workflow_name, column_id, column_name,
      type_id, type_name, title, owner_user_name, last_modified
      (+ optional custom_fields array<struct<field_id,field_name,
      display_value>>).
    transitions: card_id, idx (array position), column_id,
      column_name, start.

    ``bucketed_facts=True`` declares that cards/transitions come from
    ``stage_card_facts_bucketed`` (co-bucketed on the STRING card key):
    the ``live`` working-set checkpoint is skipped, because (a) the
    re-join it avoids is already exchange-free against the bucketed
    layout, and (b) a localCheckpoint under AQE reports
    UnknownPartitioning, which would re-insert the very card-key
    Exchange the layout exists to remove (measured: the compression
    window re-shuffled the checkpointed frame). With the flag the
    whole transform plans with ZERO fact-side Exchanges. In that mode
    the shared transition working set is ``persist()``-ed; pass a list
    as ``persist_handles`` to receive the cached frame and unpersist
    it once the returned states/snapshots actions have run.

    Returns (states, snapshots) — the StandardStateItem /
    StandardSnapshotItem shapes of ts:174-201 and ts:265-285.
    """
    cards = cards.withColumn(
        "workflow_id",
        card_workflow_id(F.lit(org_id), F.col("board_id"), F.col("workflow_name")),
    )
    cfg = configured_cards(cards, work_item_type_maps)

    # transitions of configured cards only (the skip happens before
    # transformCard/transformTransitions, ts:461-464). live feeds BOTH
    # the compressed history and the auto-map seen-set: a lazy
    # localCheckpoint pins the filtered transition working set so the
    # steps-dim materialization job below reuses it instead of
    # re-joining the raw stream (measured A/B/C at sf0.1: live+dim
    # checkpoints 5.6s < no checkpoints 6.2s < dim-only 7.6s — and at
    # scale it is the variant that touches the raw stream exactly once)
    # r17: past the size gate, the STRING card key is derived BEFORE
    # the compression window and used as its partition key. Downstream,
    # every wide operator keys on work_item_id (event-date windows, the
    # per-item aggregate, the states join): compressing on card_id and
    # casting after costs a SECOND full shuffle of the COMPRESSED
    # transition stream, because hash(bigint) != hash(cast as string)
    # and Catalyst does not track partitioning through the cast. One
    # key, one Exchange — the shape that wins once shuffle bytes
    # dominate. BELOW the gate the split shape is kept: a measured
    # in-session interleaved A/B at sf0.1 read the fused form 1.11x
    # (string-keyed compression sort +0.13 s of it) — at bench scale
    # the second exchange is cheaper than the string sort. Both paths
    # are pinned row-identical by tests/test_kanbanize.py.
    # In bucketed_facts mode card_id already IS the string bucket key
    # (SimplifyCasts keeps the layout's partitioning intact), so the
    # fused key is free and unconditional there.
    from falcon_metrics_etl_spark.session import scale_gate

    fuse_key = bucketed_facts or scale_gate(
        transitions, _CARD_FUSE_CONF, _CARD_FUSE_MIN_BYTES_DEFAULT
    )
    live = transitions.join(
        cfg.select("card_id", "workflow_id"), "card_id", "inner"
    )
    if fuse_key:
        live = live.withColumn(
            "work_item_id", F.col("card_id").cast("string")
        )
    if bucketed_facts:
        # persist, not localCheckpoint: a checkpoint under AQE reports
        # UnknownPartitioning and the compression window would re-insert
        # the card-key Exchange the bucketed layout removed. A cached
        # plan keeps its output partitioning (AQE cannot change cached
        # plan partitioning by default), so consumers get BOTH the
        # shared materialization and the exchange-free card-key plan.
        # The handle is surfaced via persist_handles (r9 advisor: a
        # steady-state pipeline calling the transform every tick would
        # otherwise accumulate cached partitions for the session) —
        # callers unpersist after the states/snapshots actions finish.
        live = live.persist()
        if persist_handles is not None:
            persist_handles.append(live)
    else:
        live = perf_checkpoint(live)
    if fuse_key:
        comp = compress_transitions(live, card_col="work_item_id")
    else:
        comp = compress_transitions(live).withColumn(
            "work_item_id", F.col("card_id").cast("string")
        )
    history = comp.select(
        "work_item_id",
        "workflow_id",
        F.col("column_id").cast("string").alias("status_id"),
        F.col("column_name").alias("status_name"),
        F.col("start").alias("changed_date"),
        "revision",
        F.lit("state_change").alias("type"),
        F.lit(False).alias("flagged"),
    )

    if auto_map:
        # unmapped-step detection matches the reference's
        # getUnmappedWorkflowSteps input (ts:416-427): the card's
        # CURRENT column plus its transitions. The transition side is
        # taken BEFORE compression — compression only drops consecutive
        # duplicates, so the distinct (workflow, column) set is
        # identical and the dedupe subtree skips the window.
        # Divergence from the reference, deliberate: ts:416-464 runs
        # getUnmappedWorkflowSteps BEFORE the isConfiguredCardType
        # skip, so steps seen only on unconfigured cards are written
        # into config as a side effect. This engine has no config
        # write-back and those steps can never be referenced by an
        # emitted state/snapshot (their cards are dropped), so the
        # seen-set is built from configured cards only — one fewer
        # pass over the unfiltered transition stream, identical output.
        seen_src = live.select(
            "workflow_id",
            F.col("column_id").cast("string").alias("status_id"),
            F.col("column_name").alias("status_name"),
        ).unionByName(
            cfg.select(
                "workflow_id",
                F.col("column_id").cast("string").alias("status_id"),
                F.col("column_name").alias("status_name"),
            )
        )
        # The augmented dim is at most |config| + |distinct seen
        # steps| rows, but its lineage drags the full transition
        # stream (union + left_anti dedupe) into every consumer —
        # tag_zones, effective_point_orders and the states
        # current-step join each re-derived it (audited r4: 22
        # shuffles / 6 sort-merge joins for kanbanize_card_states).
        # A LAZY localCheckpoint (eager=False — no job at definition,
        # keeping the registry no-action contract) materializes the
        # dedupe once; every consumer then broadcast-joins the
        # materialized few-thousand-row dim.
        workflow_steps = perf_checkpoint(
            auto_map_unmapped_steps(seen_src, workflow_steps)
        )
    tagged = tag_zones(history, workflow_steps, workflow_events)
    event_dates = extract_event_dates_expr(tagged)
    points = effective_point_orders(workflow_steps, workflow_events)

    # ---- states (transformCard ts:151-207) --------------------------------
    current_step = workflow_steps.select(
        F.col("workflow_id").alias("_cur_wf"),
        F.col("step_id").cast("string").alias("_cur_step_id"),
        F.col("step_name").alias("_cur_step_name"),
        F.col("step_order").alias("_cur_order"),
        F.col("state_type").alias("_cur_state_type"),
    )
    type_dims = work_item_type_maps.select(
        F.col("datasource_work_item_id").cast("string").alias("_map_type"),
        F.col("project_id").cast("string").alias("_map_board"),
        F.col("work_item_type_id").alias("flomatika_work_item_type_id"),
        F.col("service_level_expectation_in_days").alias(
            "flomatika_type_sle_days"
        ),
    ).join(
        # explicit hint: both sides are tiny config dims, but the plan
        # builds this under the outer broadcast of type_dims and the
        # planner picked a sort-merge join for the inner dim-dim pair
        F.broadcast(
            work_item_types.select(
                F.col("id").alias("flomatika_work_item_type_id"),
                F.col("display_name").alias("flomatika_work_item_type_name"),
                F.col("level").alias("flomatika_work_item_type_level"),
            )
        ),
        "flomatika_work_item_type_id",
        "left",
    )

    states = (
        cfg.withColumn("work_item_id", F.col("card_id").cast("string"))
        .join(event_dates, "work_item_id", "left")
        .join(
            F.broadcast(current_step),
            (F.col("workflow_id") == F.col("_cur_wf"))
            & (F.col("column_id").cast("string") == F.col("_cur_step_id"))
            & (F.col("column_name") == F.col("_cur_step_name")),
            "left",
        )
        .drop("_cur_wf")
        .join(F.broadcast(points), "workflow_id", "left")
        .join(
            F.broadcast(type_dims),
            (
                F.coalesce(F.col("type_id").cast("string"), F.lit("0"))
                == F.col("_map_type")
            )
            & (F.col("board_id").cast("string") == F.col("_map_board")),
            "left",
        )
        .withColumn("state_category", state_category_from_dates())
        .withColumn(
            "step_category",
            step_category(
                F.col("_cur_order").cast("double"),
                F.col("effective_arrival_order"),
                F.col("effective_commitment_order"),
                F.col("effective_departure_order"),
            ),
        )
        .select(
            "work_item_id",
            F.col("board_id").cast("string").alias("project_id"),
            "workflow_id",
            F.col("column_name").alias("state"),
            F.col("_cur_order").cast("string").alias("state_order"),
            F.col("_cur_state_type").alias("state_type"),
            "state_category",
            "step_category",
            "arrival_date",
            "commitment_date",
            "departure_date",
            F.coalesce("is_delayed", F.lit(False)).alias("is_delayed"),
            F.coalesce(F.col("type_name"), F.lit("Card")).alias("work_item_type"),
            "flomatika_work_item_type_id",
            "flomatika_work_item_type_name",
            "flomatika_work_item_type_level",
            "flomatika_type_sle_days",
            F.col("title"),
            F.col("owner_user_name").alias("assigned_to"),
            F.col("last_modified").alias("changed_date"),
            *(
                [
                    transform_card_custom_fields(F.col("custom_fields")).alias(
                        "custom_fields"
                    )
                ]
                if "custom_fields" in cards.columns
                else []
            ),
        )
    )

    # ---- snapshots (transformTransitions ts:209-288) ----------------------
    snaps = derive_snapshots(tagged, event_dates)
    snapshots = snaps.select(
        "work_item_id",
        "revision",
        F.col("type"),
        F.col("changed_date"),
        "snapshot_date",
        F.col("status_name").alias("state"),
        F.col("step_order").cast("string").alias("state_order"),
        F.col("state_type"),
        "step_category",
        "state_category",
        "is_delayed",
        F.lit(False).alias("is_filler"),
    )
    return states, snapshots


def stage_card_facts_bucketed(
    spark,
    cards: DataFrame,
    transitions: DataFrame,
    table_prefix: str,
    num_buckets: int = 32,
    base_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Stage the Kanbanize card fact pair as CO-BUCKETED tables on the
    string card key — the ingest-time layout that removes every fact
    Exchange from ``transform_cards`` (SURVEY S5; the r7 plan audit
    showed the transform's one surviving sort-merge join was exactly
    the cfg⨝event_dates card-key join paying Exchange+Sort on the
    unbucketed side every run).

    Why the STRING key: the transform derives ``work_item_id`` as
    ``cast(card_id as string)``. Bucketing on a bigint card_id would
    hash differently from the string join key downstream and the
    Exchange would reappear; staging the key as string makes the cast
    trivial (Catalyst's SimplifyCasts removes it), so the bucketed
    HashPartitioning propagates through the whole transform — the
    live join, the compression window, the event-date aggregation and
    the states/snapshots joins all plan with ZERO fact shuffles, and
    the per-bucket ``sortBy`` feeds the compression window's
    (card, idx) sort for free while each bucket holds one file.

    One-time layout cost at ingest, paid back on every downstream run
    — the same trade the states/snapshots bucketed sink makes. Both
    tables MUST share ``num_buckets`` (co-bucketed joins only drop the
    Exchange when bucket counts match).
    """
    from falcon_metrics_etl_spark.sinks.bucketed import write_bucketed

    cards_staged = cards.withColumn(
        "card_id", F.col("card_id").cast("string")
    )
    trans_staged = transitions.withColumn(
        "card_id", F.col("card_id").cast("string")
    )
    suffix = {"cards": cards_staged, "transitions": trans_staged}
    sort_cols = {"cards": ("card_id",), "transitions": ("card_id", "idx")}
    for name, df in suffix.items():
        write_bucketed(
            df.repartition(num_buckets, "card_id"),
            f"{table_prefix}_{name}",
            ("card_id",),
            num_buckets,
            sort_cols=sort_cols[name],
            path=f"{base_path}/{name}" if base_path else None,
        )
    return (
        spark.table(f"{table_prefix}_cards"),
        spark.table(f"{table_prefix}_transitions"),
    )


def enrich_raw_cards(
    raw_cards: DataFrame,
    boards: DataFrame,
    workflows: DataFrame,
    columns: DataFrame,
    types: DataFrame,
    users: DataFrame,
    custom_field_names: dict[int, str] | None = None,
) -> DataFrame:
    """Entity-name enrichment of raw cards — the extract-side
    mapRawCardsToCards (extract_state_processor.ts:336-395): raw cards
    carry only ids; board/workflow/column names resolve via the entity
    dims, type_name stays null for untyped cards (ts:388), owner name
    resolves per user id (ts:372-375), and custom-field entries whose
    field_id has no configured name are DROPPED (ts:353-371 logs and
    skips them).

    Dims are (id, name) pairs — tiny config tables, all broadcast.
    custom_field_names is the config map collected at plan-build time
    (same pattern as the field mapper): the array column rewrites with
    a map literal + filter HOF, no explode.
    """

    def named(dim: DataFrame, id_col: str, out: str) -> DataFrame:
        return dim.select(
            F.col(dim.columns[0]).alias(id_col),
            F.col(dim.columns[1]).alias(out),
        )

    out = (
        raw_cards.join(
            F.broadcast(named(boards, "board_id", "board_name")),
            "board_id",
            "left",
        )
        .join(
            F.broadcast(named(workflows, "workflow_id", "workflow_name")),
            "workflow_id",
            "left",
        )
        .join(
            F.broadcast(named(columns, "column_id", "column_name")),
            "column_id",
            "left",
        )
        .join(
            F.broadcast(named(types, "type_id", "type_name")), "type_id", "left"
        )
        .join(
            F.broadcast(named(users, "owner_user_id", "owner_user_name")),
            "owner_user_id",
            "left",
        )
    )
    if custom_field_names is not None and "custom_fields" in raw_cards.columns:
        if custom_field_names:
            name_map = F.create_map(
                *[
                    F.lit(x)
                    for kv in custom_field_names.items()
                    for x in kv
                ]
            )
        else:
            name_map = F.create_map().cast("map<int,string>")
        enriched_cf = F.transform(
            F.filter(
                F.col("custom_fields"),
                lambda cf: name_map[cf["field_id"]].isNotNull(),
            ),
            lambda cf: F.struct(
                cf["field_id"].alias("field_id"),
                name_map[cf["field_id"]].alias("field_name"),
                cf["display_value"].alias("display_value"),
            ),
        )
        out = out.withColumn("custom_fields", enriched_cf)
    return out
