"""Tests for the silver transform layer: flag propagation (ported from
src/jiracloud/process/utils.test.ts:286-375), custom-field extraction
(translate_customfield.test.ts:5-416), linked items, revision ops, and
the end-to-end transform_work_items pipeline."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions.custom_fields import (
    extract_custom_field_values,
    translate_custom_fields,
)
from falcon_metrics_etl_spark.functions.field_mapper import apply_field_maps
from falcon_metrics_etl_spark.functions.linked_items import translate_linked_items
from falcon_metrics_etl_spark.operators.revisions import (
    dedupe_consecutive,
    densify_daily,
    synthesize_initial_revision,
)
from falcon_metrics_etl_spark.operators.snapshots import propagate_flag_intervals
from falcon_metrics_etl_spark.operators.transform import transform_work_items


def d(day, hour=0):
    return datetime(2021, 3, day, hour)


# ---------------------------------------------------------------- W7 flag

SNAP_SCHEMA = (
    "work_item_id string, revision int, type string, flagged boolean, "
    "status_id string, status_name string, state_type string, step_category string"
)


def snap_rows(spark, rows):
    return spark.createDataFrame(rows, SNAP_SCHEMA)


def test_flag_interval_propagation(spark):
    rows = [
        ("A", 1, "state_change", None, "s1", "In Progress", "active", "inprogress"),
        ("A", 2, "flagged", True, None, None, None, None),
        ("A", 3, "assignee_change", None, None, None, None, None),
        ("A", 4, "flagged", False, None, None, None, None),
        ("A", 5, "state_change", None, "s2", "Done", "active", "completed"),
    ]
    out = {
        r["revision"]: r.asDict()
        for r in propagate_flag_intervals(snap_rows(spark, rows)).collect()
    }
    # rows 2..3 flagged, unflag row 4 false, others false
    assert out[1]["flagged"] is False
    assert out[2]["flagged"] is True
    assert out[3]["flagged"] is True
    assert out[4]["flagged"] is False
    assert out[5]["flagged"] is False
    # flag + unflag rows inherit the previous state_change fields
    assert out[2]["status_name"] == "In Progress"
    assert out[2]["state_type"] == "active"
    assert out[4]["status_name"] == "In Progress"
    # non-flag rows keep their own values
    assert out[5]["status_name"] == "Done"


def test_flag_without_unflag_runs_to_end(spark):
    rows = [
        ("A", 1, "state_change", None, "s1", "Doing", "active", "inprogress"),
        ("A", 2, "flagged", True, None, None, None, None),
        ("A", 3, "state_change", None, "s2", "Done", "active", "completed"),
    ]
    out = {
        r["revision"]: r.asDict()
        for r in propagate_flag_intervals(snap_rows(spark, rows)).collect()
    }
    assert out[2]["flagged"] is True
    assert out[3]["flagged"] is True


def test_first_revision_flagged_gets_queue_state_type(spark):
    rows = [
        ("A", 1, "flagged", True, None, None, None, None),
        ("A", 2, "state_change", None, "s1", "Doing", "active", "inprogress"),
    ]
    out = {
        r["revision"]: r.asDict()
        for r in propagate_flag_intervals(snap_rows(spark, rows)).collect()
    }
    assert out[1]["state_type"] == "queue"
    assert out[1]["flagged"] is True


# ------------------------------------------------------------- F9 custom

CF_CASES = [
    ("null", ["null"]),  # null payload -> literal 'null'
    ('"plain string"', ["plain string"]),
    ("42", ["42"]),
    ("true", ["true"]),
    ('{"name": "by-name"}', ["by-name"]),
    ('{"value": "by-value"}', ["by-value"]),
    ('{"displayName": "by-display"}', ["by-display"]),
    ('{"key": "by-key"}', ["by-key"]),
    ('{"self": "x", "weird": 1}', ['{"self":"x","weird":1}']),  # stringify fallback
    ('["a", "b"]', ["a", "b"]),
    ('[{"name": "n1"}, {"value": "v2"}]', ["n1", "v2"]),
    ('[{"other": true}]', ['{"other":true}']),
]


def test_custom_field_extraction_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CF_CASES)], "id int, raw string"
    )
    got = {
        r["id"]: r["vals"]
        for r in df.select(
            "id", extract_custom_field_values(F.col("raw")).alias("vals")
        ).collect()
    }
    for i, (_, expected) in enumerate(CF_CASES):
        assert got[i] == expected, CF_CASES[i]


def test_unknown_object_requires_customfield_prefix(spark):
    """translate_customfield.test.ts:368-416: an unknown-shaped object
    is stringified only for 'customfield*'-named fields; system fields
    of unknown shape produce no rows."""
    df = spark.createDataFrame(
        [("A", {"label": '{"t1": 100}', "customfield_label": '{"t1": 100}'})],
        "work_item_id string, custom_fields_raw map<string,string>",
    )
    cfgs = [
        {"datasourceFieldName": "label", "displayName": "L", "type": "system"},
        {"datasourceFieldName": "customfield_label", "displayName": "CL",
         "type": "system"},
    ]
    out = translate_custom_fields(df, cfgs).collect()[0]["custom_fields"]
    got = {(c["datasourceFieldName"], c["datasourceFieldValue"]) for c in out}
    assert got == {("customfield_label", '{"t1":100}')}


def test_translate_custom_fields_combines_configs(spark):
    df = spark.createDataFrame(
        [("A", {"cf_1": '{"name": "alpha"}', "cf_2": '["x","y"]'})],
        "work_item_id string, custom_fields_raw map<string,string>",
    )
    cfgs = [
        {"datasourceFieldName": "cf_1", "displayName": "Team", "type": "string"},
        {"datasourceFieldName": "cf_2", "displayName": "Tags", "type": "multi"},
        {"datasourceFieldName": "cf_missing", "displayName": "Gone", "type": "string"},
    ]
    out = translate_custom_fields(df, cfgs).collect()[0]["custom_fields"]
    got = {(c["datasourceFieldName"], c["datasourceFieldValue"]) for c in out}
    assert got == {("cf_1", "alpha"), ("cf_2", "x"), ("cf_2", "y")}


# ------------------------------------------------------------ F10 linked

def test_translate_linked_items(spark):
    schema = (
        "issuelinks array<struct<type:struct<outward:string,inward:string>,"
        "outwardIssue:struct<key:string>,inwardIssue:struct<key:string>>>"
    )
    df = spark.createDataFrame(
        [
            (
                [
                    (("blocks", "is blocked by"), ("FLO-2",), None),
                    (("blocks", "is blocked by"), None, ("FLO-3",)),
                    (("relates", "relates"), None, None),
                ],
            )
        ],
        schema,
    )
    out = df.select(
        translate_linked_items(F.col("issuelinks")).alias("links")
    ).collect()[0]["links"]
    assert [(l["type"], l["workItemId"]) for l in out] == [
        ("blocks", "FLO-2"),
        ("is blocked by", "FLO-3"),
    ]


# ------------------------------------------------------------ F17 mapper

def test_field_mapper_chain_of_responsibility(spark):
    """field_mapper.test.ts:87-242: all-conditions-true maps the value
    (116), dest created when absent (148), a false condition maps
    nothing (179), NO conditions maps nothing (211); chained mappers
    all execute so the last match wins (ts:10-19)."""
    df = spark.createDataFrame(
        [("A", "bug", "urgent"), ("B", "task", "normal"), ("C", "epic", "low")],
        "work_item_id string, kind string, prio string",
    )
    maps = [
        {"srcField": "prio", "dstField": "cos", "conditions": {"kind": "bug"}},
        {"srcField": "kind", "dstField": "cos",
         "conditions": {"kind": "bug", "prio": "urgent"}},  # overlap: wins
        {"srcField": "kind", "dstField": "cos", "conditions": {}},  # inert
        {"srcField": "prio", "dstField": "cos",
         "conditions": {"kind": "task", "prio": "wrong"}},  # false cond
    ]
    out = {r["work_item_id"]: r["cos"] for r in apply_field_maps(df, maps).collect()}
    assert out == {"A": "bug", "B": None, "C": None}


# --------------------------------------------------------- revision ops

def test_dedupe_consecutive_null_safe(spark):
    df = spark.createDataFrame(
        [
            ("A", 1, d(1), "x"),
            ("A", 2, d(2), "x"),
            ("A", 3, d(3), None),
            ("A", 4, d(4), None),
            ("A", 5, d(5), "x"),
        ],
        "work_item_id string, revision int, changed_date timestamp, assignee string",
    )
    kept = sorted(
        r["revision"] for r in dedupe_consecutive(df, "assignee").collect()
    )
    assert kept == [1, 3, 5]


def test_densify_daily_filler_rows(spark):
    df = spark.createDataFrame(
        [("A", 1, d(1), "s1"), ("A", 2, d(4), "s2")],
        "work_item_id string, revision int, changed_date timestamp, status_id string",
    )
    out = densify_daily(df).collect()
    fillers = [r for r in out if r["is_filler"]]
    assert {r["changed_date"].day for r in fillers} == {2, 3}
    assert all(r["status_id"] == "s1" for r in fillers)
    assert len([r for r in out if not r["is_filler"]]) == 2


# ------------------------------------------------------- full pipeline

def test_transform_work_items_end_to_end(spark):
    work_items = spark.createDataFrame(
        [
            ("org1", "ds1", "A", "wf1", "s3", "departure step", d(1), d(5)),
            ("org1", "ds1", "B", "wf1", "s9", "mystery step", d(2), d(6)),
        ],
        "org_id string, datasource_id string, work_item_id string, "
        "workflow_id string, status_id string, status_name string, "
        "created_date timestamp, updated_date timestamp",
    )
    revisions = spark.createDataFrame(
        [
            ("org1", "ds1", "A", "wf1", 1, d(2), "state_change", "s1", "arrival step", "s0", "backlog step", None, None, None, None),
            ("org1", "ds1", "A", "wf1", 2, d(3), "state_change", "s2", "commitment step", "s1", "arrival step", None, None, None, None),
            ("org1", "ds1", "A", "wf1", 3, d(4), "state_change", "s3", "departure step", "s2", "commitment step", None, None, None, None),
            # item B only visits an unknown step
            ("org1", "ds1", "B", "wf1", 1, d(3), "state_change", "s9", "mystery step", None, None, None, None, None, None),
        ],
        "org_id string, datasource_id string, work_item_id string, "
        "workflow_id string, revision int, changed_date timestamp, type string, "
        "status_id string, status_name string, from_status_id string, "
        "from_status_name string, assignee string, blocked_reason string, "
        "discarded_reason string, flagged boolean",
    )
    steps = spark.createDataFrame(
        [
            ("wf1", "s0", "backlog step", 0, "queue", "proposed", True),
            ("wf1", "s1", "arrival step", 1, "active", "proposed", True),
            ("wf1", "s2", "commitment step", 2, "active", "inprogress", True),
            ("wf1", "s3", "departure step", 3, "active", "completed", True),
        ],
        "workflow_id string, step_id string, step_name string, step_order int, "
        "state_type string, state_category string, active boolean",
    )
    events = spark.createDataFrame(
        [("wf1", 1, 2, 3)],
        "workflow_id string, arrival_point_order int, "
        "commitment_point_order int, departure_point_order int",
    )

    states, snapshots = transform_work_items(work_items, revisions, steps, events)
    st = {r["work_item_id"]: r.asDict() for r in states.collect()}

    # item A: synthetic revision 0 lands in the backlog (before-arrival)
    # step at creation, so arrival comes from the first real move
    assert st["A"]["arrival_date"] == d(2)
    assert st["A"]["commitment_date"] == d(3)
    assert st["A"]["departure_date"] == d(4)
    assert st["A"]["state_category"] == "completed"
    assert st["A"]["step_category"] == "completed"

    # item B: unknown step auto-mapped to order 9999 => departure zone
    assert st["B"]["state_category"] == "completed"
    assert st["B"]["step_category"] == "completed"

    sn = snapshots.filter(F.col("work_item_id") == "A").collect()
    by_rev = {r["revision"]: r.asDict() for r in sn}
    assert by_rev[0]["state_category"] == "preceding"  # before arrival
    assert by_rev[1]["state_category"] == "proposed"  # at arrival
    assert by_rev[2]["state_category"] == "inprogress"
    assert by_rev[3]["state_category"] == "completed"
    assert all(r["is_delayed"] is False for r in sn)


# ----------------------------------------------------- F6 notifications

def test_threshold_evaluation_reference_scenarios(spark):
    """flomatika_notifications utils.test.ts:10-86: month/day/week unit
    switches and the evaluate path for the example subscription."""
    from falcon_metrics_etl_spark.functions.scalar import (
        difference_over_threshold,
        evaluate_threshold,
    )

    df = spark.createDataFrame(
        [
            # (id, target, predicted, unit, threshold, expected)
            (1, "2022-02-01", "2022-02-05", "month", 1.0, False),
            (2, "2022-02-01", "2022-03-05", "month", 1.0, True),
            (3, "2022-02-01", "2022-02-01", "day", 1.0, False),
            (4, "2022-02-01", "2022-02-05", "day", 1.0, True),
            (5, "2022-02-01", "2022-02-03", "week", 1.0, False),
            (6, "2022-02-01", "2022-02-15", "week", 1.0, True),
        ],
        "id int, target string, predicted string, unit string, "
        "threshold double, expected boolean",
    )
    for unit in ("day", "week", "month"):
        part = df.filter(F.col("unit") == unit)
        got = part.select(
            "id",
            difference_over_threshold(
                F.to_date("target"), F.to_date("predicted"), unit, 1.0
            ).alias("over"),
            "expected",
        ).collect()
        for r in got:
            assert r["over"] == r["expected"], (unit, r["id"])

    # evaluate: 7-day threshold, direction both, target 2022-04-25,
    # p85 2022-04-03 -> notify (utils.test.ts:56-86)
    one = spark.createDataFrame(
        [("2022-04-25", "2022-04-03")], "target string, p85 string"
    )
    row = one.select(
        evaluate_threshold(
            F.to_date("target"), F.to_date("p85"), "day", 7.0, "both"
        ).alias("notify")
    ).collect()[0]
    assert row["notify"] is True


def test_parent_resolution_three_way_fallback(spark):
    """revision_processor.ts:874-898: fields.parent.key wins; else the
    Jira-server Parent Link field; else the epic-link custom field from
    config. Presence of the parent OBJECT decides branch 1 (a parent
    struct with null key yields null, no fallback), and empty strings
    in raw fields are absent (JS truthiness)."""
    from falcon_metrics_etl_spark.operators.transform import (
        PARENT_LINK_JIRA_SERVER,
        resolve_parent_id,
    )

    rows = [
        # parent struct wins over both raw fields
        ("A", ("P-1",), {PARENT_LINK_JIRA_SERVER: "PL-1", "cf_epic": "E-1"}),
        # parent struct present with null key: branch taken, result null
        ("B", (None,), {PARENT_LINK_JIRA_SERVER: "PL-2", "cf_epic": "E-2"}),
        # no parent struct: parent link beats epic link
        ("C", None, {PARENT_LINK_JIRA_SERVER: "PL-3", "cf_epic": "E-3"}),
        # empty parent link string is falsy -> epic link
        ("D", None, {PARENT_LINK_JIRA_SERVER: "", "cf_epic": "E-4"}),
        # only epic link
        ("E", None, {"cf_epic": "E-5"}),
        # nothing
        ("F", None, {}),
    ]
    df = spark.createDataFrame(
        rows,
        "work_item_id string, parent struct<key:string>, "
        "fields map<string,string>",
    )
    got = {
        r.work_item_id: r.parent_id
        for r in resolve_parent_id(df, epic_link_field="cf_epic").collect()
    }
    assert got == {
        "A": "P-1", "B": None, "C": "PL-3", "D": "E-4", "E": "E-5",
        "F": None,
    }


def test_epic_link_field_from_config(spark):
    from falcon_metrics_etl_spark.operators.transform import (
        epic_link_field_from_config,
    )

    cfg = spark.createDataFrame(
        [("epic", "customfield_10008"), ("number", "customfield_2")],
        "type string, datasource_field_name string",
    )
    assert epic_link_field_from_config(cfg) == "customfield_10008"
    assert epic_link_field_from_config(cfg.filter("type = 'number'")) is None


def test_transform_work_items_carries_parent_id(spark):
    """States out of the full pipeline get parent_id when the bronze
    items carry parent/fields columns (states.parentId feeds portfolio
    lead time in the reference)."""
    from falcon_metrics_etl_spark.operators.transform import (
        PARENT_LINK_JIRA_SERVER,
    )

    items = spark.createDataFrame(
        [
            ("org", "ds", "W-1", "wf", "s2", "Done", datetime(2024, 1, 1),
             ("EPIC-9",), {}),
            ("org", "ds", "W-2", "wf", "s2", "Done", datetime(2024, 1, 1),
             None, {PARENT_LINK_JIRA_SERVER: "EPIC-7"}),
        ],
        "org_id string, datasource_id string, work_item_id string, "
        "workflow_id string, status_id string, "
        "status_name string, created_date timestamp, "
        "parent struct<key:string>, fields map<string,string>",
    )
    revisions = spark.createDataFrame(
        [
            ("W-1", "wf", 1, datetime(2024, 1, 2), "state_change",
             "s2", "Done", "s1", "To Do"),
            ("W-2", "wf", 1, datetime(2024, 1, 2), "state_change",
             "s2", "Done", "s1", "To Do"),
        ],
        "work_item_id string, workflow_id string, revision int, "
        "changed_date timestamp, type string, status_id string, "
        "status_name string, from_status_id string, "
        "from_status_name string",
    )
    steps = spark.createDataFrame(
        [("wf", "s1", "To Do", 1, "queue", None, True),
         ("wf", "s2", "Done", 3, "active", None, True)],
        "workflow_id string, step_id string, step_name string, "
        "step_order int, state_type string, state_category string, "
        "active boolean",
    )
    events = spark.createDataFrame(
        [("wf", 1, 2, 3)],
        "workflow_id string, arrival_point_order int, "
        "commitment_point_order int, departure_point_order int",
    )
    states, _ = transform_work_items(items, revisions, steps, events)
    got = {r.work_item_id: r.parent_id for r in states.collect()}
    assert got == {"W-1": "EPIC-9", "W-2": "EPIC-7"}


def test_get_fillers_count_reference_scenario(spark):
    """Ported verbatim from jiracloud/process/utils.test.ts:377-425
    (getFillersCount): IST-midnight history; only state_change/flagged
    revisions emit fillers, the gap runs to the next revision of those
    types (blocked/discarded rows are skipped, not boundaries), count
    is floor(hours/24)."""
    from datetime import datetime, timedelta, timezone

    from falcon_metrics_etl_spark.operators.revisions import filler_counts

    IST = timezone(timedelta(hours=5, minutes=30))

    def ist(day):
        return datetime(2022, 1, day, 0, 0, tzinfo=IST)

    rows = [
        ("A", 1, "state_change", ist(1)),
        ("A", 2, "blocked_reason", ist(3)),
        ("A", 3, "state_change", ist(4)),
        ("A", 4, "flagged", ist(8)),
        ("A", 5, "blocked_reason", ist(10)),
        ("A", 6, "state_change", ist(12)),
        ("A", 7, "discarded_reason", ist(20)),
        ("A", 8, "state_change", ist(25)),
    ]
    df = spark.createDataFrame(
        rows, "work_item_id string, revision int, type string, changed_date timestamp"
    )
    got = {
        r["revision"]: r["fillers"]
        for r in filler_counts(df).collect()
    }
    assert got == {
        1: 3,   # Jan1 -> next allowed Jan4 (skips Jan3 blocked)
        2: 0,   # blocked_reason: never fills
        3: 4,   # Jan4 -> Jan8 flagged
        4: 4,   # flagged fills too: Jan8 -> Jan12
        5: 0,
        6: 13,  # Jan12 -> Jan25 (skips Jan20 discarded)
        7: 0,   # discarded_reason: never fills
        8: 0,   # no next allowed revision
    }


def test_densify_fillers_exact_rows(spark):
    from datetime import datetime

    from falcon_metrics_etl_spark.operators.revisions import (
        densify_fillers_exact,
    )

    rows = [
        ("A", 1, "state_change", datetime(2022, 1, 1, 9, 30)),
        ("A", 2, "blocked_reason", datetime(2022, 1, 2, 12, 0)),
        ("A", 3, "state_change", datetime(2022, 1, 4, 9, 30)),
    ]
    df = spark.createDataFrame(
        rows, "work_item_id string, revision int, type string, changed_date timestamp"
    )
    out = densify_fillers_exact(df).collect()
    fillers = sorted(
        (r["changed_date"] for r in out if r["is_filler"]),
    )
    # rev 1: 72 h gap -> 3 fillers at +24h steps preserving time-of-day
    # (the last coincides with the next revision's instant — the
    # reference's floor(hours/24) convention, utils.test.ts:415-416)
    assert fillers == [
        datetime(2022, 1, 2, 9, 30),
        datetime(2022, 1, 3, 9, 30),
        datetime(2022, 1, 4, 9, 30),
    ]
    assert len([r for r in out if not r["is_filler"]]) == 3


def test_field_maps_snapshot_visibility(spark):
    """Conditions and source reads evaluate against the ORIGINAL input
    row, never earlier mappers' writes: executeMap(source, destination,
    conditionsSource) keeps the three objects separate
    (field_mapper.ts:56-72; the unit suite maps source -> dest as
    distinct objects)."""
    from falcon_metrics_etl_spark.functions.field_mapper import (
        apply_field_maps,
    )

    df = spark.createDataFrame(
        [("x", "y", "bval")], "s string, a string, b string"
    )
    maps = [
        {"srcField": "a", "dstField": "s", "conditions": {"s": "x"}},
        # would only fire if map 1's write were visible — it must not be
        {"srcField": "b", "dstField": "s", "conditions": {"s": "y"}},
    ]
    row = apply_field_maps(df, maps).collect()[0]
    # map 1 fires on the original s == 'x' -> 'y'; map 2 evaluates the
    # ORIGINAL s ('x'), not 'y', so it does not fire
    assert row["s"] == "y"


def test_field_maps_last_match_wins_and_source_is_original(spark):
    from falcon_metrics_etl_spark.functions.field_mapper import (
        apply_field_maps,
    )

    df = spark.createDataFrame(
        [("x", "first", "second")], "k string, a string, b string"
    )
    maps = [
        {"srcField": "a", "dstField": "out", "conditions": {"k": "x"}},
        {"srcField": "b", "dstField": "out", "conditions": {"k": "x"}},
    ]
    row = apply_field_maps(df, maps).collect()[0]
    assert row["out"] == "second"  # last matching map wins
    # a dst that is also a later map's src still reads the original
    df2 = spark.createDataFrame([("x", "v1")], "k string, a string")
    maps2 = [
        {"srcField": "k", "dstField": "a", "conditions": {"k": "x"}},
        {"srcField": "a", "dstField": "out", "conditions": {"k": "x"}},
    ]
    row2 = apply_field_maps(df2, maps2).collect()[0]
    assert row2["a"] == "x"
    assert row2["out"] == "v1"  # original a, not map 1's write


def test_automap_covers_current_status_absent_from_revisions(spark):
    """getUnmappedWorkflowSteps receives the item's CURRENT status in
    addition to its revisions (revision_processor.ts:250-257): an item
    whose current status never appears in the changelog still resolves
    a current step via the order-9999 auto-mapping."""
    work_items = spark.createDataFrame(
        [("org1", "ds1", "C", "wf1", "s9", "ghost step", d(1), d(5))],
        "org_id string, datasource_id string, work_item_id string, "
        "workflow_id string, status_id string, status_name string, "
        "created_date timestamp, updated_date timestamp",
    )
    revisions = spark.createDataFrame(
        [
            ("org1", "ds1", "C", "wf1", 1, d(2), "state_change",
             "s1", "arrival step", "s0", "backlog step",
             None, None, None, None),
        ],
        "org_id string, datasource_id string, work_item_id string, "
        "workflow_id string, revision int, changed_date timestamp, type string, "
        "status_id string, status_name string, from_status_id string, "
        "from_status_name string, assignee string, blocked_reason string, "
        "discarded_reason string, flagged boolean",
    )
    steps = spark.createDataFrame(
        [
            ("wf1", "s0", "backlog step", 0, "queue", "proposed", True),
            ("wf1", "s1", "arrival step", 1, "active", "proposed", True),
        ],
        "workflow_id string, step_id string, step_name string, step_order int, "
        "state_type string, state_category string, active boolean",
    )
    events = spark.createDataFrame(
        [("wf1", 1, 2, 2)],
        "workflow_id string, arrival_point_order int, "
        "commitment_point_order int, departure_point_order int",
    )
    states, _ = transform_work_items(work_items, revisions, steps, events)
    row = states.collect()[0]
    assert row["step_order"] == 9999
    assert row["current_state_type"] == "queue"


# ------------------------------------------------- getRevisions (changelog)

CHANGELOG_SCHEMA = (
    "work_item_id string, changelog array<struct<id:string, created:string, "
    "items:array<struct<field:string, fieldId:string, from:string, "
    "fromString:string, to:string, toString:string>>>>"
)


def test_parse_changelog_tags_revision_types(spark):
    """getRevisions (revision_processor.ts:335-448): status/assignee/
    Flagged/configured blocked+discarded entries emit typed rows;
    empty to/toString entries are dropped except the Flagged unflag,
    which emits flagged=false with statusId/Name 'flagged'."""
    from falcon_metrics_etl_spark.operators.revisions import parse_changelog

    hist = [
        ("101", "2024-01-01T10:00:00.000+0000", [
            ("status", "status", "1", "To Do", "2", "Doing"),
        ]),
        ("102", "2024-01-02T10:00:00.000+0000", [
            ("assignee", "assignee", None, None, "u1", "Alice"),
            ("Flagged", "customfield_10021", "", "", "10019", "Impediment"),
        ]),
        ("103", "2024-01-03T10:00:00.000+0000", [
            ("Flagged", "customfield_10021", "10019", "Impediment", "", ""),
            ("Rank", "customfield_10019", None, None, "0|i0077r:", ""),
            ("Blocked Why", "customfield_77", None, None, "b1", "waiting"),
            ("Discard", "customfield_88", None, None, "d1", "dupe"),
        ]),
    ]
    df = spark.createDataFrame([("A", hist)], CHANGELOG_SCHEMA)
    out = parse_changelog(
        df,
        blocked_reason_field_id="customfield_77",
        discarded_reason_field_id="customfield_88",
    ).collect()
    by = sorted(
        ((r["revision"], r["type"]) for r in out), key=lambda x: (x[0], x[1])
    )
    assert by == [
        (101, "state_change"),
        (102, "assignee_change"),
        (102, "flagged"),
        (103, "blocked_reason"),
        (103, "discarded_reason"),
        (103, "flagged"),
    ]
    rows = {(r["revision"], r["type"]): r for r in out}
    st = rows[(101, "state_change")]
    assert (st["status_id"], st["status_name"]) == ("2", "Doing")
    assert (st["from_status_id"], st["from_status_name"]) == ("1", "To Do")
    assert rows[(102, "assignee_change")]["assignee"] == "Alice"
    assert rows[(102, "flagged")]["flagged"] is True
    unflag = rows[(103, "flagged")]
    assert unflag["flagged"] is False
    assert unflag["status_id"] == "flagged"  # ts:366-368
    assert rows[(103, "blocked_reason")]["blocked_reason"] == "waiting"
    assert rows[(103, "discarded_reason")]["discarded_reason"] == "dupe"
    # the Rank item (empty toString) emitted nothing
    assert not any(r["status_name"] == "" for r in out)


def test_parse_changelog_unconfigured_reason_fields_ignored(spark):
    from falcon_metrics_etl_spark.operators.revisions import parse_changelog

    hist = [
        ("7", "2024-01-01T00:00:00.000+0000", [
            ("Blocked Why", "customfield_77", None, None, "b1", "waiting"),
        ]),
    ]
    df = spark.createDataFrame([("A", hist)], CHANGELOG_SCHEMA)
    # without the org's configured field ids the entry is not a
    # revision at all (ts:386-389 gates on the configured ids)
    assert parse_changelog(df).count() == 0


def test_maintain_cfd_matches_full_recompute(spark):
    """IVM: folding a new-period delta into the gold CFD equals the
    full recompute — including a state that first appears in the
    delta (null offset -> 0)."""
    from falcon_metrics_etl_spark.operators.cfd import (
        cumulative_flow,
        maintain_cfd,
    )

    schema = "state string, snapshot_date date, state_category string"
    base_rows = [
        ("A", datetime(2024, 1, 1).date(), "completed"),
        ("A", datetime(2024, 1, 1).date(), "completed"),
        ("A", datetime(2024, 1, 3).date(), "completed"),
        ("A", datetime(2024, 1, 2).date(), "inprogress"),
    ]
    delta_rows = [
        ("A", datetime(2024, 2, 1).date(), "completed"),
        ("A", datetime(2024, 2, 2).date(), "completed"),
        ("B", datetime(2024, 2, 1).date(), "completed"),  # new state
        ("B", datetime(2024, 2, 1).date(), "inprogress"),
    ]
    base = spark.createDataFrame(base_rows, schema)
    delta = spark.createDataFrame(delta_rows, schema)
    full = cumulative_flow(base.unionByName(delta))
    incr = maintain_cfd(cumulative_flow(base), delta)
    key = lambda r: (r["state"], r["snapshot_date"], r["state_category"])
    got = {key(r): r["item_count"] for r in incr.collect()}
    want = {key(r): r["item_count"] for r in full.collect()}
    assert got == want
    assert got[("A", datetime(2024, 2, 2).date(), "completed")] == 5
    assert got[("B", datetime(2024, 2, 1).date(), "completed")] == 1


# -------------------------------------------- W9 Jira double-row synthesis

def test_initial_revision_assignee_row_jira_semantics(spark):
    """with_assignee_row=True replicates getRevisions' full synthesis
    (revision_processor.ts:460-499): a second revision-0
    assignee_change row whose assignee is the first assignee_change's
    fromString (the creation-time holder), null when never reassigned;
    both synthetic rows drop under the closing truthy-status filter."""
    items = spark.createDataFrame(
        [
            ("org1", "ds1", "A", "s9", "Current", d(1)),
            ("org1", "ds1", "B", "s9", "Current", d(1)),
            # item C: empty current status AND no state changes => both
            # synthetic rows are filtered out (ts:495-498)
            ("org1", "ds1", "C", "", "", d(1)),
        ],
        "org_id string, datasource_id string, work_item_id string, "
        "status_id string, status_name string, created_date timestamp",
    )
    revs = spark.createDataFrame(
        [
            # A: reassigned twice — firstAssignee = fromString of the
            # FIRST assignee change (by date), i.e. 'alice'
            ("A", 1, d(2), "state_change", "s1", "Doing", "s0", "Todo", None),
            ("A", 2, d(3), "assignee_change", "ubob", "Bob", "ualice", "alice", "Bob"),
            ("A", 3, d(4), "assignee_change", "ucarol", "Carol", "ubob", "Bob", "Carol"),
            # B: never reassigned => synthetic assignee row with null
            ("B", 1, d(2), "state_change", "s1", "Doing", "s0", "Todo", None),
            # C: only an assignee change (no state_change)
            ("C", 1, d(2), "assignee_change", "ubob", "Bob", None, None, "Bob"),
        ],
        "work_item_id string, revision int, changed_date timestamp, "
        "type string, status_id string, status_name string, "
        "from_status_id string, from_status_name string, assignee string",
    )
    out = synthesize_initial_revision(revs, items, with_assignee_row=True)
    zero = {
        (r["work_item_id"], r["type"]): r.asDict()
        for r in out.filter(F.col("revision") == 0).collect()
    }
    # A: both rows, status from the first state change's from-side
    assert zero[("A", "state_change")]["status_id"] == "s0"
    assert zero[("A", "assignee_change")]["status_id"] == "s0"
    assert zero[("A", "assignee_change")]["assignee"] == "alice"
    # B: assignee row present with null assignee (never reassigned)
    assert zero[("B", "assignee_change")]["assignee"] is None
    # C: empty status => both synthetic rows dropped; real row kept
    assert ("C", "state_change") not in zero
    assert ("C", "assignee_change") not in zero
    assert out.filter(F.col("work_item_id") == "C").count() == 1
    # default path unchanged: single state_change row per item
    legacy = synthesize_initial_revision(revs, items)
    assert (
        legacy.filter(
            (F.col("revision") == 0) & (F.col("type") == "assignee_change")
        ).count()
        == 0
    )


def test_perf_checkpoint_conf_gate(spark):
    """spark.falconMetricsEtl.perfCheckpoints=false disables the
    optional shared-subtree checkpoints (lineage-based recovery mode);
    the plan is then pure lineage but results are identical."""
    from falcon_metrics_etl_spark.session import (
        PERF_CHECKPOINT_CONF,
        perf_checkpoint,
    )

    df = spark.range(5)
    try:
        spark.conf.set(PERF_CHECKPOINT_CONF, "false")
        assert perf_checkpoint(df) is df
    finally:
        spark.conf.unset(PERF_CHECKPOINT_CONF)
    out = perf_checkpoint(df)
    assert out is not df
    assert [r["id"] for r in out.orderBy("id").collect()] == [0, 1, 2, 3, 4]
