"""Ported ADO revision-stream scenarios (A2) —
/root/reference/src/azureboards/data/revision_utils.test.ts: blocked
revisions with entry gate + flag derivation, assignee changes,
blocked/discarded-reason (custom field) changes.
"""

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.revisions import (
    blocked_revisions,
    custom_field_revisions,
    dedupe_consecutive,
)

BLOCKED_SCHEMA = "work_item_id int, revision int, state string, blocked string"

# revision_utils.test.ts:2-75 (allRevisions1)
REVS1 = [
    (7205, 1, "New", None), (7205, 2, "Pool of Options", None),
    (7205, 3, "Next", None), (7205, 4, "Next", None),
    (7205, 5, "Next", None), (7205, 6, "Custom Todo", None),
    (7205, 7, "Custom Todo", "Yes"), (7205, 8, "Custom Todo", "No"),
    (7205, 9, "Custom Todo", "Yes"), (7205, 10, "Custom Todo", "Yes"),
    (7205, 11, "Custom Todo", "No"), (7205, 12, "Custom Todo", "No"),
]

# revision_utils.test.ts:88-132 (allRevisions2): only null/'No'
REVS2 = [
    (7205, 1, "New", "No"), (7205, 2, "Pool of Options", None),
    (7205, 3, "Next", None), (7205, 4, "Next", None),
    (7205, 5, "Next", None), (7205, 6, "Custom Todo", None),
    (7205, 8, "Custom Todo", "No"),
]


def test_blocked_first_kept_is_first_blocked_and_flagged(spark):
    df = spark.createDataFrame(REVS1, BLOCKED_SCHEMA)
    out = blocked_revisions(df, "blocked", order_cols=("revision",)).orderBy(
        "revision"
    ).collect()
    # kept: 7 (Yes, T), 8 (No, F), 9 (Yes, T), 11 (No, F) — 10/12 dedupe away
    assert [(r["revision"], r["flagged"]) for r in out] == [
        (7, True), (8, False), (9, True), (11, False)
    ]


def test_no_blocked_revisions_yields_nothing(spark):
    df = spark.createDataFrame(REVS2, BLOCKED_SCHEMA)
    assert blocked_revisions(df, "blocked", order_cols=("revision",)).count() == 0


def test_assignee_changes(spark):
    # revision_utils.test.ts:137-285 (allRevisions3): null x9, Marco,
    # Shishir, Marco -> 4 kept (first revision always kept)
    rows = [(7205, r, None) for r in range(1, 10)]
    rows += [(7205, 10, "Marco"), (7205, 11, "Shishir"), (7205, 12, "Marco")]
    df = spark.createDataFrame(rows, "work_item_id int, revision int, assignee string")
    out = dedupe_consecutive(
        df, "assignee", order_cols=("revision",)
    ).orderBy("revision").collect()
    assert [r["revision"] for r in out] == [1, 10, 11, 12]


def test_blocked_reason_changes_skip_nulls(spark):
    # revision_utils.test.ts:389-494 (allRevisions4): reasons null x6,
    # 'Internal Dependency', 'External Dependency', null -> 2 kept and
    # the trailing null neither emits nor resurrects a value
    rows = [
        (7205, r, None) for r in (1, 2, 9, 10, 11, 12)
    ] + [
        (7205, 13, "Internal Dependency"),
        (7205, 14, "External Dependency"),
        (7205, 15, None),
    ]
    df = spark.createDataFrame(
        rows, "work_item_id int, revision int, reason string"
    )
    out = custom_field_revisions(df, "reason", order_cols=("revision",)).orderBy(
        "revision"
    ).collect()
    assert [(r["revision"], r["field_value"]) for r in out] == [
        (13, "Internal Dependency"), (14, "External Dependency")
    ]


def test_custom_field_null_between_equal_values_no_resurrect(spark):
    # A, null, A -> only the first A (null must not reset the baseline)
    rows = [(1, 1, "A"), (1, 2, None), (1, 3, "A")]
    df = spark.createDataFrame(rows, "work_item_id int, revision int, reason string")
    out = custom_field_revisions(df, "reason", order_cols=("revision",)).collect()
    assert [r["revision"] for r in out] == [1]


def test_blocked_multiple_items_independent(spark):
    rows = [
        (1, 1, "x", None), (1, 2, "x", "Yes"),
        (2, 1, "x", "No"), (2, 2, "x", None),
        (3, 1, "x", "Blocked-ish"), (3, 2, "x", "Blocked-ish"),
    ]
    df = spark.createDataFrame(rows, BLOCKED_SCHEMA)
    out = blocked_revisions(df, "blocked", order_cols=("revision",))
    got = sorted(
        (r["work_item_id"], r["revision"], r["flagged"]) for r in out.collect()
    )
    # item1: rev2 only; item2: nothing; item3: rev1 only (any non-'No'
    # string blocks, rev2 dedupes)
    assert got == [(1, 2, True), (3, 1, True)]


def test_exclude_before_date(spark):
    """P7 (process_revision_utils.ts:8-22): drop only items departed
    strictly before their exclude-before day; same-day, later, null
    departure, and null config all survive."""
    from datetime import datetime

    from falcon_metrics_etl_spark.operators.revisions import (
        exclude_before_date,
    )

    d = lambda day: datetime(2022, 1, day, 15, 30)
    rows = [
        (1, d(5), d(10)),   # departed before cutoff -> dropped
        (2, d(10), d(10)),  # same day -> kept (strict <)
        (3, d(15), d(10)),  # after -> kept
        (4, None, d(10)),   # never departed -> kept
        (5, d(5), None),    # no cutoff configured -> kept
    ]
    df = spark.createDataFrame(
        rows, "id int, departure_date timestamp, exclude_before_date timestamp"
    )
    kept = sorted(r["id"] for r in exclude_before_date(df).collect())
    assert kept == [2, 3, 4, 5]


# --------------------------------------------------------------------------
# F11 generic flagged-field discovery (jc_issue.ts:820-859 fallback)
# --------------------------------------------------------------------------
def test_discover_flag_fields_scans_map_for_markers(spark):
    from falcon_metrics_etl_spark.operators.revisions import (
        discover_flag_fields,
    )

    rows = [
        # item 1: flag lives in customfield_10010 (Impediment)
        (1, {"customfield_10010": [{"value": "Impediment"}],
             "labels": [{"value": "frontend"}]}),
        # item 2: Spanish marker in a different field
        (2, {"customfield_10021": [{"value": "Impedimento"}]}),
        # item 3: empty array must not match (size guard)
        (3, {"customfield_10010": [], "labels": [{"value": "Normal"}]}),
        # item 4: marker NOT in first element -> reference ignores it
        (4, {"customfield_10010": [{"value": "Normal"},
                                   {"value": "Impediment"}]}),
    ]
    df = spark.createDataFrame(
        rows,
        "work_item_id int, fields map<string, array<struct<value:string>>>",
    )
    hits = {
        (r.work_item_id, r.field_key)
        for r in discover_flag_fields(df).collect()
    }
    assert hits == {(1, "customfield_10010"), (2, "customfield_10021")}
