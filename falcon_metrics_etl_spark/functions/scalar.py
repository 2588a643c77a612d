"""Scalar column functions — SURVEY.md section 2.8 (F1-F17 subset).

All are Catalyst expressions (no Python UDFs): they stay inside
whole-stage codegen and cost nothing extra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def slugify(col: Column) -> Column:
    """F1 — slugify: lowercase, collapse non-alphanumeric runs to '-'.

    Matches the reference's workflow-key construction
    (slugify(`org.projectId.issuetypeName`).toLowerCase() —
    /root/reference/src/jiracloud/process/revision_processor.ts:508-510)
    with '.' preserved as the segment separator.
    """
    return F.lower(F.regexp_replace(col, r"[^a-zA-Z0-9.]+", "-"))


def partition_key(kind: str, org_col: Column) -> Column:
    """F2 — `state#org` style partition keys
    (src/workitem/state_load_processor_aurora.ts:49)."""
    return F.concat(F.lit(f"{kind}#"), org_col)


def sort_key(*cols: Column) -> Column:
    """F2 — '#'-joined composite sort keys
    (src/workitem/state_load_processor_aurora.ts:50-51)."""
    return F.concat_ws("#", *cols)


def date_surrogate_key(col: Column) -> Column:
    """F4 — yyyyMMdd surrogate date key (src/utils/date_utils.ts:27-33)."""
    return F.date_format(col, "yyyyMMdd")


def whole_days_between(start: Column, end: Column) -> Column:
    """F5 — whole-day difference (src/utils/date_utils.ts:109-117)."""
    return F.datediff(F.to_date(end), F.to_date(start))


def same_utc_day(a: Column, b: Column) -> Column:
    """F5 — Luxon hasSame('day') in UTC
    (src/configuration/event_date_extractor.ts:242-247)."""
    return F.to_date(a) == F.to_date(b)


def pct_round2(numerator: Column, denominator: Column) -> Column:
    """F13 — percentage rounded to 2dp
    (extract_flomatika_insights_processor.ts:144-146)."""
    return F.round(numerator * 100.0 / denominator, 2)
