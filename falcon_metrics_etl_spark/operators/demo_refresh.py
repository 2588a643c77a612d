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
    for c in date_cols:
        out = out.withColumn(
            c,
            F.when(
                F.col("__shift_days") > 0,
                F.date_add(F.col(c), F.col("__shift_days")),
            ).otherwise(F.col(c)),
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
