"""Sprint ETL operator tests (extract_sprints_processor.ts parity):
P5 address gate, uniqBy-first dedupe, 4-column-PK bridge distinct."""

from datetime import date

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.sprints import (
    dedupe_sprints_first,
    flatten_sprints,
    sprint_work_item_bridge,
    valid_contexts,
)


def test_valid_contexts_requires_int_address(spark):
    ctx = spark.createDataFrame(
        [("a", "12"), ("b", "n/a"), ("c", None), ("d", "0")],
        "context_id string, context_address string",
    )
    kept = sorted(r["context_id"] for r in valid_contexts(ctx).collect())
    assert kept == ["a", "d"]


def test_uniqby_keeps_first_in_iteration_order(spark):
    cb = spark.createDataFrame(
        [("ctx0", 0, 10), ("ctx9", 9, 10)],
        "context_id string, ctx_order int, board_id int",
    )
    sp = spark.createDataFrame(
        [(100, 10, "S100", date(2024, 1, 1), date(2024, 1, 15))],
        "sprint_id int, board_id int, sprint_name string, "
        "start_date date, end_date date",
    )
    flat = flatten_sprints(cb, sp, "org", "ds")
    assert flat.count() == 2  # duplicate paths kept in the flat list
    deduped = dedupe_sprints_first(flat).collect()
    assert len(deduped) == 1
    # _.uniqBy keeps the FIRST occurrence (ts:431-433): lowest ctx_order
    assert deduped[0]["context_id"] == "ctx0"


def test_bridge_rows_are_distinct_on_pk(spark):
    sp = spark.createDataFrame(
        [("org", "ds", "100", "S", date(2024, 1, 1), date(2024, 1, 15), "c", 0, 1)],
        "org_id string, datasource_id string, sprint_id string, "
        "sprint_name string, start_date date, end_date date, "
        "context_id string, ctx_order int, board_id int",
    )
    members = spark.createDataFrame(
        [("100", "W-1"), ("100", "W-1"), ("100", "W-2")],
        "sprint_id string, work_item_id string",
    )
    out = sprint_work_item_bridge(sp, members)
    got = sorted(r["work_item_id"] for r in out.collect())
    # redelivered memberships collapse into the keyed upsert (ST2)
    assert got == ["W-1", "W-2"]
