"""Ported demo-data date-refresh scenarios (F15) —
/root/reference/src/update_mock_data_date/date_update.test.ts, with
the reference's DateTime.utc() pinned to a fixed anchor so the
expectations are deterministic."""

from datetime import date, datetime

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.demo_refresh import (
    rebase_stale_weeks,
    reindex_months,
    shift_date_range,
    shift_quarters,
    shift_series_weeks,
)

def ANCHOR():  # a Wednesday; week start Mon 14th
    return F.lit("2023-08-16").cast("date")


def test_update_weeks_shifts_series_preserving_spacing(spark):
    """date_update.test.ts:202-235 ('test update week'): two
    consecutive weeks end on the current week, keeping the 1-week gap
    (updateSummaryWidgetWeeks shifts by the latest-week delta)."""
    df = spark.createDataFrame(
        [("k", date(2020, 7, 20)), ("k", date(2020, 7, 27))],
        "key string, week_starting date",
    )
    out = {
        (r["week_starting"], r["week"], r["year"])
        for r in shift_series_weeks(df, ["key"], "week_starting", ANCHOR()).collect()
    }
    assert out == {
        (date(2023, 8, 7), 32, 2023),
        (date(2023, 8, 14), 33, 2023),
    }


def test_update_months_position_reindex(spark):
    """date_update.test.ts:236-271: last entry -> anchor month, the one
    before -> anchor month - 1; original month values ignored; year is
    pinned to the anchor year on every entry (reference verbatim)."""
    df = spark.createDataFrame(
        [("k", 1, 2021, 3), ("k", 2, 2021, 4)],
        "key string, pos int, year int, month int",
    )
    out = {
        (r["pos"], r["month"], r["year"])
        for r in reindex_months(df, ["key"], ["pos"], ANCHOR()).collect()
    }
    assert out == {(1, 7, 2023), (2, 8, 2023)}


def test_update_months_year_pin_is_reference_verbatim(spark):
    """The reference pins year = now.year even when the walk-back
    crosses January (ts:232-236) — replicated."""
    jan_anchor = F.lit("2023-01-15").cast("date")
    df = spark.createDataFrame(
        [("k", 1, 2022, 11), ("k", 2, 2022, 12)],
        "key string, pos int, year int, month int",
    )
    out = {
        (r["pos"], r["month"], r["year"])
        for r in reindex_months(df, ["key"], ["pos"], jan_anchor).collect()
    }
    # month walks back into December, year stays the anchor's
    assert out == {(1, 12, 2023), (2, 1, 2023)}


def test_update_quarters_linear_shift_with_year_carry(spark):
    """date_update.test.ts:272-300: (y-1,Q4),(y,Q1) anchored at
    2023-Q3 -> the last entry becomes (2023,Q3), the first keeps the
    one-quarter gap => (2023,Q2); crossing Q4 carries the year."""
    df = spark.createDataFrame(
        [("k", 2021, 4), ("k", 2022, 1)],
        "key string, year int, quarter int",
    )
    out = {
        (r["year"], r["quarter"])
        for r in shift_quarters(df, ["key"], "year", "quarter", ANCHOR()).collect()
    }
    assert out == {(2023, 2), (2023, 3)}


def test_update_quarters_q4_stays_q4_not_q0(spark):
    """Documented divergence: the reference's modulo yields quarter 0
    for exact multiples of 4 (ts:270-271); the engine keeps 1..4."""
    anchor_q4 = F.lit("2023-11-05").cast("date")  # Q4
    df = spark.createDataFrame(
        [("k", 2022, 3), ("k", 2022, 4)],
        "key string, year int, quarter int",
    )
    out = {
        (r["year"], r["quarter"])
        for r in shift_quarters(df, ["key"], "year", "quarter", anchor_q4).collect()
    }
    assert out == {(2023, 3), (2023, 4)}


def test_update_wip_dates_shift_by_until_gap(spark):
    """date_update.test.ts:89-148 ('test update wip dates'): every
    date column shifts forward by (anchor - until); series already at
    the anchor are untouched (shift_date_range, utils ts:67-85)."""
    df = spark.createDataFrame(
        [
            ("stale", datetime(2021, 5, 1), datetime(2021, 5, 10)),
            ("fresh", datetime(2023, 8, 10), datetime(2023, 8, 16)),
        ],
        "key string, start_date timestamp, until_date timestamp",
    )
    out = {
        r["key"]: (r["start_date"], r["until_date"])
        for r in shift_date_range(
            df, ["start_date", "until_date"], "until_date", ANCHOR()
        ).collect()
    }
    assert out["stale"] == (datetime(2023, 8, 7), datetime(2023, 8, 16))
    assert out["fresh"] == (datetime(2023, 8, 10), datetime(2023, 8, 16))


def test_update_flow_efficiency_rebases_stale_weeks(spark):
    """date_update.test.ts:23-88: a weekly series whose latest week is
    stale is rebased to the current week (updateFlowEfficiency)."""
    df = spark.createDataFrame(
        [("k", date(2021, 5, 10)), ("k", date(2021, 5, 17))],
        "key string, week date",
    )
    out = {
        r["week"]
        for r in rebase_stale_weeks(df, ["key"], "week", ANCHOR()).collect()
    }
    assert out == {date(2023, 8, 14)}


def test_update_wip_dates_preserves_time_of_day(spark):
    """Shifting a TIMESTAMP column moves it by whole days without
    truncating the time-of-day (date_add would return a DATE and zero
    the clock on shifted rows only)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from falcon_metrics_etl_spark.operators.demo_refresh import (
        shift_date_range,
    )

    df = spark.createDataFrame(
        [(1, datetime(2021, 5, 1, 14, 30), datetime(2021, 5, 3, 9, 15))],
        "id int, start_date timestamp, until_date timestamp",
    )
    out = shift_date_range(
        df,
        ["start_date", "until_date"],
        "until_date",
        F.to_timestamp(F.lit("2021-05-10 00:00:00")),
    ).collect()[0]
    # shifted by datediff(anchor, until) = 7 days, clock preserved
    assert out["start_date"] == datetime(2021, 5, 8, 14, 30)
    assert out["until_date"] == datetime(2021, 5, 10, 9, 15)
