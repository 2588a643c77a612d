"""Demo-data date refresh — SURVEY.md F15.

The reference's daily update_mock_data_date job rewrites demo metric
payloads so dashboards look current (date_update_utils.ts:12-260):

- date ranges shift forward by (today - untilDate) when positive
  (updateWip, ts:67-85);
- weekly series are rebased to the current week when their latest week
  is stale (updateFlowEfficiency ts:34-66, updateThroughput ts:128-162
  — Luxon startOf('week') = Monday, matching Spark date_trunc('week')).

Here each payload is a ROW (the reference's JSON payloads are rows of
a demo metric table), so both rules are plain column expressions —
no collect, no UDF; ``anchor`` ("today") is passed in as a Column so
jobs can pin it for deterministic tests/oracles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shift_date_range(
    df: DataFrame,
    date_cols: Sequence[str],
    until_col: str,
    anchor: Column,
) -> DataFrame:
    """Shift every column in ``date_cols`` forward by
    (anchor - until_col) days when that difference is positive;
    rows already reaching the anchor are untouched
    (date_update_utils.ts:67-85)."""
    # materialize the diff first: until_col may itself be in date_cols,
    # and every column must shift by the ORIGINAL difference
    out = df.withColumn("__shift_days", F.datediff(anchor, F.col(until_col)))
    dtypes = dict(df.dtypes)
    for c in date_cols:
        if dtypes.get(c) == "date":
            shifted = F.date_add(F.col(c), F.col("__shift_days"))
        else:
            # timestamps shift by an interval: date_add would return a
            # DATE and the when/otherwise coercion back to timestamp
            # truncates the shifted rows to midnight while untouched
            # rows keep their time-of-day
            shifted = F.col(c) + F.make_interval(days=F.col("__shift_days"))
        out = out.withColumn(
            c,
            F.when(F.col("__shift_days") > 0, shifted).otherwise(F.col(c)),
        )
    return out.drop("__shift_days")


def rebase_stale_weeks(
    df: DataFrame,
    key_cols: Sequence[str],
    week_col: str,
    anchor: Column,
) -> DataFrame:
    """Per key group: when the group's LATEST week is not the anchor's
    week, every row's week is set to the anchor's week start (Monday) —
    the reference's whole-series rebase (date_update_utils.ts:42-64).
    Groups whose latest week is current are untouched."""
    grp = Window.partitionBy(*key_cols)
    latest = F.max(F.col(week_col)).over(grp)
    current_week = F.date_trunc("week", anchor).cast(
        df.schema[week_col].dataType
    )
    stale = F.date_trunc("week", latest) != F.date_trunc("week", anchor)
    return df.withColumn(
        week_col, F.when(stale, current_week).otherwise(F.col(week_col))
    )


def shift_series_weeks(
    df: DataFrame,
    key_cols: Sequence[str],
    week_col: str,
    anchor: Column,
) -> DataFrame:
    """Summary-widget weekly rebase (date_update_utils.ts:189-225,
    updateSummaryWidgetWeeks): shift the WHOLE per-key series so its
    latest week lands on the anchor's week, preserving the spacing
    between entries (contrast rebase_stale_weeks, which collapses the
    series). Adds ``week``/``year`` of the shifted week start (ISO week
    number + calendar year, matching Luxon weekNumber/.year)."""
    grp = Window.partitionBy(*key_cols)
    latest_start = F.date_trunc("week", F.max(F.col(week_col)).over(grp))
    diff_days = F.datediff(F.date_trunc("week", anchor), latest_start)
    shifted = F.date_trunc(
        "week", F.date_add(F.col(week_col).cast("date"), diff_days)
    ).cast("date")
    return (
        df.withColumn(week_col, shifted)
        .withColumn("week", F.weekofyear(F.col(week_col)))
        .withColumn("year", F.year(F.col(week_col)))
    )


def reindex_months(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    anchor: Column,
) -> DataFrame:
    """Summary-widget month re-index (date_update_utils.ts:226-241,
    updateSummaryWidgetMonths): POSITION-based — the last entry becomes
    the anchor's month, each preceding entry walks one month back;
    original month values are ignored. The reference also pins
    year = anchor year on every entry (even when the walk-back crosses
    January) — replicated verbatim for parity."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    n = F.count(F.lit(1)).over(Window.partitionBy(*key_cols))
    idx = F.row_number().over(w)
    month_start = F.add_months(
        F.date_trunc("month", anchor).cast("date"), idx - n
    )
    return df.withColumn("month", F.month(month_start)).withColumn(
        "year", F.year(anchor)
    )


def shift_quarters(
    df: DataFrame,
    key_cols: Sequence[str],
    year_col: str,
    quarter_col: str,
    anchor: Column,
) -> DataFrame:
    """Summary-widget quarter shift (date_update_utils.ts:242-277,
    updateSummaryWidgetQuarters): linear quarter arithmetic anchored on
    the per-key LATEST entry — every entry moves by the same
    (anchor - latest) quarter delta, with year carry. Uses exact
    modular math (quarter always 1..4); the reference's
    ``newQuarter - 4*floor(newQuarter/4)`` yields quarter 0 when the
    shifted quarter is a multiple of 4 — an evident off-by-one kept
    OUT of this engine (documented divergence)."""
    grp = Window.partitionBy(*key_cols)
    lin = F.col(year_col) * 4 + (F.col(quarter_col) - 1)
    anchor_lin = F.year(anchor) * 4 + (F.quarter(anchor) - 1)
    # stage the shifted linear quarter BEFORE overwriting either source
    # column (withColumn re-reads current columns)
    staged = df.withColumn("__new_lin", lin + (anchor_lin - F.max(lin).over(grp)))
    return (
        staged.withColumn(
            quarter_col, (F.pmod(F.col("__new_lin"), F.lit(4)) + 1).cast("int")
        )
        .withColumn(year_col, F.floor(F.col("__new_lin") / 4).cast("int"))
        .drop("__new_lin")
    )
