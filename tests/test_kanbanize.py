"""Kanbanize transform scenario tests — ported from the reference's
transform_processor.ts behaviors (SURVEY.md S5/P6/W10):

- getStateTransitions (ts:293-312): run-length compression, revision =
  original array index;
- isConfiguredCardType (ts:375-400, 461-464): type-map skip, missing
  type_id treated as '0';
- identifyWorkflowStep (ts:120-149): match requires BOTH id and name;
- transformCard (ts:151-207): event dates over the compressed history,
  state category by date presence, type dims, SLE;
- transformTransitions (ts:209-288): per-snapshot step category and
  as-of state category;
- transformCustomFields (ts:495-511): drop entries without a display
  value, empty -> null.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.kanbanize import (
    card_workflow_id,
    compress_transitions,
    configured_cards,
    transform_cards,
)

ORG = "test-org"
WF_SLUG = "test-org.7.main-flow"  # slugify('test-org.7.Main Flow')


def _dims(spark, type_rows=(("1", "7", "wit-1", 5),)):
    steps = spark.createDataFrame(
        [
            (WF_SLUG, "10", "Backlog", 1, "queue"),
            (WF_SLUG, "20", "Doing", 2, "active"),
            (WF_SLUG, "30", "Done", 3, "queue"),
        ],
        "workflow_id string, step_id string, step_name string, "
        "step_order int, state_type string",
    )
    events = spark.createDataFrame(
        [(WF_SLUG, 1, 2, 3)],
        "workflow_id string, arrival_point_order int, "
        "commitment_point_order int, departure_point_order int",
    )
    maps = spark.createDataFrame(
        list(type_rows),
        "datasource_work_item_id string, project_id string, "
        "work_item_type_id string, service_level_expectation_in_days int",
    )
    wits = spark.createDataFrame(
        [("wit-1", "Story", "Team")],
        "id string, display_name string, level string",
    )
    return steps, events, maps, wits


def _card(spark, card_id=1, type_id="1", column_id=30, column_name="Done"):
    return spark.createDataFrame(
        [
            (
                card_id,
                "7",
                "Main Flow",
                column_id,
                column_name,
                type_id,
                "Story",
                "a title",
                "alice",
                datetime(2024, 3, 1),
            )
        ],
        "card_id int, board_id string, workflow_name string, "
        "column_id int, column_name string, type_id string, "
        "type_name string, title string, owner_user_name string, "
        "last_modified timestamp",
    )


def _transitions(spark, rows):
    """rows: (card_id, idx, column_id, column_name, start)"""
    return spark.createDataFrame(
        list(rows),
        "card_id int, idx int, column_id int, column_name string, "
        "start timestamp",
    )


def test_workflow_slug_matches_reference_shape(spark):
    df = spark.range(1).select(
        card_workflow_id(F.lit("My Org"), F.lit(12), F.lit("Team Flow!")).alias("w")
    )
    # slugify lowercases and collapses non-alphanumeric runs to '-'
    # (transform_processor.ts:95-97)
    assert df.first()["w"] == "my-org.12.team-flow-"


def test_compression_keeps_first_of_run_with_original_index(spark):
    t = _transitions(
        spark,
        [
            (1, 0, 10, "Backlog", datetime(2024, 1, 1)),
            (1, 1, 10, "Backlog", datetime(2024, 1, 2)),
            (1, 2, 20, "Doing", datetime(2024, 1, 3)),
            (1, 3, 20, "Doing", datetime(2024, 1, 4)),
            (1, 4, 10, "Backlog", datetime(2024, 1, 5)),
        ],
    )
    out = compress_transitions(t).orderBy("revision").collect()
    assert [(r["revision"], r["column_id"]) for r in out] == [
        (0, 10),
        (2, 20),
        (4, 10),
    ]


def test_type_map_skip_and_null_type_defaults_to_zero(spark):
    cards = spark.createDataFrame(
        [(1, "7", "1"), (2, "7", "9"), (3, "7", None), (4, "8", "1")],
        "card_id int, board_id string, type_id string",
    )
    maps = spark.createDataFrame(
        [("1", "7", "wit-1", 5), ("0", "7", "wit-0", 5)],
        "datasource_work_item_id string, project_id string, "
        "work_item_type_id string, service_level_expectation_in_days int",
    )
    kept = sorted(
        r["card_id"] for r in configured_cards(cards, maps).collect()
    )
    # card 2: unmapped type; card 4: right type, wrong board; card 3:
    # null type falls back to '0' which IS mapped (ts:378-379)
    assert kept == [1, 3]


def test_full_card_transform_states(spark):
    steps, events, maps, wits = _dims(spark)
    cards = _card(spark)
    trans = _transitions(
        spark,
        [
            (1, 0, 10, "Backlog", datetime(2024, 1, 1)),
            (1, 1, 20, "Doing", datetime(2024, 1, 10)),
            (1, 2, 30, "Done", datetime(2024, 1, 20)),
        ],
    )
    states, snapshots = transform_cards(
        cards, trans, steps, events, maps, wits, ORG
    )
    row = states.collect()[0]
    assert row["workflow_id"] == WF_SLUG
    assert row["arrival_date"] == datetime(2024, 1, 1)
    assert row["commitment_date"] == datetime(2024, 1, 10)
    assert row["departure_date"] == datetime(2024, 1, 20)
    assert row["state_category"] == "completed"
    assert row["step_category"] == "completed"
    assert row["state"] == "Done"
    assert row["state_order"] == "3"  # stateOrder is a STRING (ts:193)
    assert row["state_type"] == "queue"
    assert row["flomatika_work_item_type_id"] == "wit-1"
    assert row["flomatika_work_item_type_name"] == "Story"
    assert row["flomatika_type_sle_days"] == 5
    assert row["is_delayed"] is False

    snaps = snapshots.orderBy("revision").collect()
    assert [r["revision"] for r in snaps] == [0, 1, 2]
    assert [r["step_category"] for r in snaps] == [
        "proposed",
        "inprogress",
        "completed",
    ]
    # as-of state category: each snapshot compares its changedDate to
    # the item's event dates (stateCategoryRelativeToDate, ts:252-263)
    assert [r["state_category"] for r in snaps] == [
        "proposed",
        "inprogress",
        "completed",
    ]
    assert all(r["type"] == "state_change" for r in snaps)
    assert all(r["is_filler"] is False for r in snaps)


def test_current_step_match_requires_id_and_name(spark):
    steps, events, maps, wits = _dims(spark)
    # current column id 30 exists but the name doesn't match the step:
    # NOT a step match (IsSameWorkflowStepKey needs BOTH id and name,
    # ts:120-149) — but getUnmappedWorkflowSteps includes the card's
    # CURRENT column (ts:416-427), so it auto-maps to order 9999 /
    # queue and identifyWorkflowStep then finds the auto-mapped step
    cards = _card(spark, column_id=30, column_name="Finished")
    trans = _transitions(
        spark, [(1, 0, 10, "Backlog", datetime(2024, 1, 1))]
    )
    states, _ = transform_cards(cards, trans, steps, events, maps, wits, ORG)
    row = states.collect()[0]
    assert row["state_order"] == "9999"
    assert row["state_type"] == "queue"
    # with auto-mapping off the engine surfaces a null step instead of
    # the reference's throw
    states2, _ = transform_cards(
        cards, trans, steps, events, maps, wits, ORG, auto_map=False
    )
    row2 = states2.collect()[0]
    assert row2["state_order"] is None
    assert row2["state_type"] is None


def test_unmapped_transition_step_automaps_to_queue(spark):
    steps, events, maps, wits = _dims(spark)
    cards = _card(spark, column_id=10, column_name="Backlog")
    trans = _transitions(
        spark,
        [
            (1, 0, 10, "Backlog", datetime(2024, 1, 1)),
            (1, 1, 99, "Mystery", datetime(2024, 1, 5)),
        ],
    )
    _, snapshots = transform_cards(cards, trans, steps, events, maps, wits, ORG)
    mystery = snapshots.filter(F.col("state") == "Mystery").collect()[0]
    # auto-mapped with order 9999 / stateType queue
    # (unmapped_workflow_step.ts:87-105 via transform ts:416-444)
    assert mystery["state_order"] == "9999"
    assert mystery["state_type"] == "queue"
    assert mystery["step_category"] == "completed"


def test_delayed_card(spark):
    steps, events, maps, wits = _dims(spark)
    cards = _card(spark, column_id=10, column_name="Backlog")
    trans = _transitions(
        spark,
        [
            (1, 0, 10, "Backlog", datetime(2024, 1, 1)),
            (1, 1, 20, "Doing", datetime(2024, 1, 10)),
            (1, 2, 10, "Backlog", datetime(2024, 2, 1)),
        ],
    )
    states, snapshots = transform_cards(
        cards, trans, steps, events, maps, wits, ORG
    )
    row = states.collect()[0]
    # a later-day return to the arrival zone after commitment marks the
    # item delayed (event_date_extractor.ts:241-277)
    assert row["is_delayed"] is True
    assert row["commitment_date"] == datetime(2024, 1, 10)
    snaps = {r["revision"]: r for r in snapshots.collect()}
    assert snaps[2]["is_delayed"] is True
    assert snaps[0]["is_delayed"] is False


def test_custom_fields_translation(spark):
    steps, events, maps, wits = _dims(spark)
    cards = _card(spark).withColumn(
        "custom_fields",
        F.array(
            F.struct(
                F.lit(101).alias("field_id"),
                F.lit("Severity").alias("field_name"),
                F.lit("High").alias("display_value"),
            ),
            F.struct(
                F.lit(102).alias("field_id"),
                F.lit("Ghost").alias("field_name"),
                F.lit(None).cast("string").alias("display_value"),
            ),
        ),
    )
    trans = _transitions(
        spark, [(1, 0, 10, "Backlog", datetime(2024, 1, 1))]
    )
    states, _ = transform_cards(cards, trans, steps, events, maps, wits, ORG)
    cf = states.collect()[0]["custom_fields"]
    # entries without a display value are dropped (ts:499); the kept
    # one is renamed to the CustomField shape with type 'string'
    assert len(cf) == 1
    assert cf[0]["datasource_field_name"] == "101"
    assert cf[0]["datasource_field_value"] == "High"
    assert cf[0]["display_name"] == "Severity"
    assert cf[0]["type"] == "string"


def test_custom_fields_all_missing_yields_null(spark):
    steps, events, maps, wits = _dims(spark)
    cards = _card(spark).withColumn(
        "custom_fields",
        F.array(
            F.struct(
                F.lit(102).alias("field_id"),
                F.lit("Ghost").alias("field_name"),
                F.lit(None).cast("string").alias("display_value"),
            ),
        ),
    )
    trans = _transitions(
        spark, [(1, 0, 10, "Backlog", datetime(2024, 1, 1))]
    )
    states, _ = transform_cards(cards, trans, steps, events, maps, wits, ORG)
    # empty result -> undefined/null (ts:509)
    assert states.collect()[0]["custom_fields"] is None


def test_enrich_raw_cards_entity_names(spark):
    """Extract-side entity-name enrichment (mapRawCardsToCards,
    extract_state_processor.ts:336-395): names resolve from the dims,
    untyped cards keep a null type_name, and custom-field entries with
    an unknown field_id are dropped."""
    from falcon_metrics_etl_spark.operators.kanbanize import enrich_raw_cards

    raw = spark.createDataFrame(
        [
            (1, 7, 40, 30, 5, 9),
            (2, 7, 40, 30, None, None),  # untyped card, no owner
        ],
        "card_id int, board_id int, workflow_id int, column_id int, "
        "type_id int, owner_user_id int",
    ).withColumn(
        "custom_fields",
        F.array(
            F.struct(
                F.lit(101).alias("field_id"),
                F.lit("High").alias("display_value"),
            ),
            F.struct(
                F.lit(999).alias("field_id"),  # unknown -> dropped
                F.lit("x").alias("display_value"),
            ),
        ),
    )
    dims = {
        "boards": [(7, "Board 7")],
        "workflows": [(40, "Main Flow")],
        "columns": [(30, "Done")],
        "types": [(5, "Story")],
        "users": [(9, "alice")],
    }
    mk = lambda rows: spark.createDataFrame(rows, "id int, name string")
    out = enrich_raw_cards(
        raw,
        mk(dims["boards"]),
        mk(dims["workflows"]),
        mk(dims["columns"]),
        mk(dims["types"]),
        mk(dims["users"]),
        custom_field_names={101: "Severity"},
    )
    rows = {r["card_id"]: r for r in out.collect()}
    assert rows[1]["board_name"] == "Board 7"
    assert rows[1]["workflow_name"] == "Main Flow"
    assert rows[1]["column_name"] == "Done"
    assert rows[1]["type_name"] == "Story"
    assert rows[1]["owner_user_name"] == "alice"
    cf = rows[1]["custom_fields"]
    assert len(cf) == 1 and cf[0]["field_name"] == "Severity"
    assert rows[2]["type_name"] is None
    assert rows[2]["owner_user_name"] is None


def test_compression_single_and_empty_histories(spark):
    t = _transitions(spark, [(1, 0, 10, "Backlog", datetime(2024, 1, 1))])
    out = compress_transitions(t).collect()
    assert len(out) == 1 and out[0]["revision"] == 0
    empty = compress_transitions(t.filter("card_id = 999"))
    assert empty.count() == 0


def test_kanbanize_incremental_recompute(spark, tmp_path):
    """ST3 over the Kanbanize path: when a card changes, its WHOLE
    compressed history re-derives event dates (the reference refetches
    the full changelog every time); the second tick's late Done
    transition flips the same card to departed via the keyed MERGE."""
    from falcon_metrics_etl_spark.operators.kanbanize import (
        compress_transitions,
    )
    from falcon_metrics_etl_spark.operators.event_dates import (
        extract_event_dates_expr,
        tag_zones,
    )
    from falcon_metrics_etl_spark.streaming.incremental import (
        run_incremental_batch,
    )

    steps, events, _, _ = _dims(spark)
    sink = str(tmp_path / "kb_states")
    cursor = str(tmp_path / "kb_cursor")

    def transform(histories):
        comp = compress_transitions(histories, card_col="work_item_id")
        hist = comp.select(
            "work_item_id",
            F.lit(WF_SLUG).alias("workflow_id"),
            F.col("column_id").cast("string").alias("status_id"),
            F.col("column_name").alias("status_name"),
            F.col("start").alias("changed_date"),
            "revision",
        )
        return extract_event_dates_expr(tag_zones(hist, steps, events))

    def revs(rows):
        return spark.createDataFrame(
            rows,
            "work_item_id string, idx int, column_id int, "
            "column_name string, start timestamp, updated timestamp",
        )

    t1 = revs(
        [
            ("C1", 0, 10, "Backlog", datetime(2024, 1, 1), datetime(2024, 1, 1)),
            ("C1", 1, 20, "Doing", datetime(2024, 1, 5), datetime(2024, 1, 5)),
        ]
    )
    n = run_incremental_batch(
        spark, t1, transform, sink, ["work_item_id"], cursor,
        updated_col="updated",
    )
    assert n == 1
    row = spark.read.parquet(sink).collect()[0]
    assert row["commitment_date"] == datetime(2024, 1, 5)
    assert row["departure_date"] is None

    # tick 2: only the new transition is past the cursor, but the FULL
    # history is recomputed (semi-join), so departure appears
    t2 = t1.unionByName(
        revs([("C1", 2, 30, "Done", datetime(2024, 2, 1), datetime(2024, 2, 1))])
    )
    n2 = run_incremental_batch(
        spark, t2, transform, sink, ["work_item_id"], cursor,
        updated_col="updated",
    )
    assert n2 == 1
    row2 = spark.read.parquet(sink).collect()[0]
    assert row2["departure_date"] == datetime(2024, 2, 1)
    assert row2["commitment_date"] == datetime(2024, 1, 5)


def test_bucketed_card_facts_plan_and_parity(spark, tmp_path, sf_smoke):
    """stage_card_facts_bucketed: co-bucketing the card fact pair on the
    string card key removes EVERY fact-side Exchange from
    transform_cards (the r7 plan audit's surviving SMJ paid
    Exchange+Sort on the card key each run), and the staged transform
    returns row-identical states/snapshots."""
    import falcon_metrics_etl_spark.plans.kanbanize_queries as KQ
    from falcon_metrics_etl_spark.operators.kanbanize import (
        stage_card_facts_bucketed,
        transform_cards,
    )

    cards, transitions, steps, events, maps, wits = KQ._build_inputs(
        spark, sf_smoke
    )
    states0, snaps0 = transform_cards(
        cards, transitions, steps, events, maps, wits, KQ._ORG
    )
    for t in ("kbt_cards", "kbt_transitions"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        bc, bt = stage_card_facts_bucketed(
            spark, cards, transitions, "kbt", 4, str(tmp_path / "kb")
        )
        handles = []
        states1, snaps1 = transform_cards(
            bc, bt, steps, events, maps, wits, KQ._ORG,
            bucketed_facts=True, persist_handles=handles,
        )
        assert len(handles) == 1  # the persisted live working set
        for df in (states1, snaps1):
            plan = df._jdf.queryExecution().executedPlan().toString()
            # the only shuffles left are dim-sized (type-map dedup,
            # workflow point orders) — no card/work-item fact exchange
            assert "Exchange hashpartitioning(card_id" not in plan
            assert "Exchange hashpartitioning(work_item_id" not in plan

        def rows(df):
            cols = [c for c in df.columns if c != "custom_fields"]
            return sorted(tuple(r) for r in df.select(*cols).collect())

        assert rows(states0) == rows(states1)
        assert rows(snaps0) == rows(snaps1)
        for h in handles:
            h.unpersist()
    finally:
        for t in ("kbt_cards", "kbt_transitions"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_card_key_fuse_gate_row_identical(spark, sf_smoke):
    """r17: the single-exchange card-key fusion (compression window
    keyed on the string work_item_id) must be row-identical to the
    split two-exchange shape — force each path via the threshold conf
    and compare (the r16 mix-gate pin pattern)."""
    from falcon_metrics_etl_spark.operators.kanbanize import _CARD_FUSE_CONF
    from falcon_metrics_etl_spark.plans.registry import all_queries

    reg = all_queries()

    def rows(name):
        return sorted(tuple(r) for r in reg[name].spark(spark, sf_smoke).collect())

    conf = spark.conf
    old = conf.get(_CARD_FUSE_CONF, None)
    try:
        conf.set(_CARD_FUSE_CONF, str(1 << 60))  # split (long-key) shape
        s_split = rows("kanbanize_card_states")
        n_split = rows("kanbanize_card_snapshots")
        conf.set(_CARD_FUSE_CONF, "0")  # fused single-exchange shape
        s_fused = rows("kanbanize_card_states")
        n_fused = rows("kanbanize_card_snapshots")
    finally:
        if old is None:
            conf.unset(_CARD_FUSE_CONF)
        else:
            conf.set(_CARD_FUSE_CONF, old)
    assert s_split == s_fused
    assert n_split == n_fused
    assert len(s_split) > 0 and len(n_split) > 0
