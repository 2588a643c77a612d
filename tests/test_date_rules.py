"""Ported date-rule scenarios — /root/reference/src/utils/
date_utils.test.ts: point-in-time state category (W5), category from
dates (W4), and the scheduler past-due rule."""

from datetime import datetime

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions.scalar import past_due
from falcon_metrics_etl_spark.operators.event_dates import (
    point_in_time_state_category,
    state_category_from_dates,
)

T = datetime(2021, 8, 31, 23, 59, 59)
A = datetime(2021, 4, 6, 0, 40, 32)
C = datetime(2021, 7, 26, 22, 17, 21)
D = datetime(2021, 8, 25, 23, 18, 40)


def categorize(spark, rows):
    df = spark.createDataFrame(
        rows,
        "id int, changed timestamp, arrival timestamp, "
        "commitment timestamp, departure timestamp",
    )
    out = df.select(
        "id",
        point_in_time_state_category(
            F.col("changed"), F.col("arrival"),
            F.col("commitment"), F.col("departure"),
        ).alias("cat"),
    )
    return {r["id"]: r["cat"] for r in out.collect()}


def test_point_in_time_category_scenarios(spark):
    d1 = datetime(2021, 8, 30)
    d2 = datetime(2021, 8, 31)
    d3 = datetime(2021, 9, 1)
    got = categorize(spark, [
        # date_utils.test.ts:41-106 matrix
        (1, d2, None, None, None),          # no arrival -> preceding
        (2, d1, d2, None, None),            # changed < arrival -> preceding
        (3, d2, d1, None, None),            # changed > arrival -> proposed
        (4, d2, d1, d3, None),              # changed < commitment -> proposed
        (5, d2, d1, d2, d3),                # commitment<=changed<departure -> inprogress
        (6, d3, d1, d1, d2),                # changed >= departure -> completed
        # ts:108-125 exact-instant regression (UTC-normalized)
        (7, T, A, C, D),                    # -> completed
        # guard-ORDER edge cases (date_utils.ts:74-95): arrival checked
        # FIRST, so out-of-order dates don't leak later categories
        (8, d2, d3, d1, None),              # commitment<changed<arrival -> preceding
        (9, d3, None, d1, d2),              # no arrival at all -> preceding
        (10, d2, d1, None, d1),             # no commitment -> proposed even past departure
    ])
    assert got == {
        1: "preceding", 2: "preceding", 3: "proposed", 4: "proposed",
        5: "inprogress", 6: "completed", 7: "completed",
        8: "preceding", 9: "preceding", 10: "proposed",
    }


def test_state_category_from_dates_missing_arrival_is_preceding(spark):
    df = spark.createDataFrame(
        [(1, None, None, None)],
        "id int, arrival_date timestamp, commitment_date timestamp, "
        "departure_date timestamp",
    )
    row = df.select(state_category_from_dates().alias("cat")).collect()[0]
    assert row["cat"] == "preceding"


def test_past_due_rule(spark):
    now = datetime(2022, 1, 10, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (1, None, 5),                            # no base -> due
            (2, datetime(2022, 1, 10, 11, 0), None), # no period -> due
            (3, datetime(2022, 1, 10, 11, 0), 30),   # 11:30 due -> past
            (4, datetime(2022, 1, 10, 11, 50), 30),  # 12:20 due -> not yet
        ],
        "id int, base timestamp, period int",
    )
    out = df.select(
        "id",
        past_due(F.col("base"), F.col("period"), F.lit(now)).alias("due"),
    )
    got = {r["id"]: r["due"] for r in out.collect()}
    assert got == {1: True, 2: True, 3: True, 4: False}


def ref_state_category_relative(cmp, arrival, commitment, departure):
    """Literal port of stateCategoryRelativeToDate (date_utils.ts:67-95)."""
    if not arrival or cmp < arrival:
        return "preceding"
    if not commitment or cmp < commitment:
        return "proposed"
    if cmp >= commitment and (not departure or cmp < departure):
        return "inprogress"
    if departure and cmp >= departure:
        return "completed"
    return "preceding"


def test_point_in_time_category_matches_reference_on_random_orderings(spark):
    """Fuzz the full cross of date orderings (including nulls and exact
    ties) against the literal reference port — pins the guard-order
    semantics, not just the happy path."""
    import random

    rng = random.Random(11)
    base = datetime(2022, 1, 1)
    from datetime import timedelta

    def maybe_date():
        return (
            None
            if rng.random() < 0.25
            else base + timedelta(days=rng.randint(0, 6))
        )

    rows = []
    for i in range(300):
        cmp = base + timedelta(days=rng.randint(0, 6))
        rows.append((i, cmp, maybe_date(), maybe_date(), maybe_date()))
    got = categorize(spark, rows)
    for i, cmp, a, c, d in rows:
        assert got[i] == ref_state_category_relative(cmp, a, c, d), (
            i, cmp, a, c, d, got[i],
        )
