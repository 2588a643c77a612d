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


def difference_over_threshold(
    target: Column, predicted: Column, unit: str, threshold: float
) -> Column:
    """F6 notifications — |predicted - target| in ``unit`` exceeds the
    threshold (flomatika_notifications/process/utils.ts:23-47).

    Units: 'day' (whole-day diff), 'week' (days/7, Luxon's exact
    day-based week diff), 'month' (calendar-aware fractional months,
    ``months_between``). Unknown units raise (the reference's switch
    silently returns true; being loud is safer for configs).
    """
    if unit == "day":
        diff = F.abs(F.datediff(predicted, target))
    elif unit == "week":
        diff = F.abs(F.datediff(predicted, target) / F.lit(7.0))
    elif unit == "month":
        diff = F.abs(F.months_between(predicted, target))
    else:
        raise ValueError(f"unknown threshold unit {unit!r}")
    return diff > F.lit(threshold)


def direction_correct(target: Column, predicted: Column, direction: str) -> Column:
    """F6 notifications — notify only when the forecast moved in the
    subscribed direction (utils.ts:9-22): 'down' = slipped later,
    'up' = pulled earlier, 'both' = always."""
    if direction == "down":
        return predicted > target
    if direction == "up":
        return predicted < target
    return F.lit(True)


def evaluate_threshold(
    target: Column,
    predicted: Column,
    unit: str,
    threshold: float,
    direction: str = "both",
) -> Column:
    """F6 — full subscription evaluation (utils.ts:55-80): direction
    gate AND threshold breach; a null target never notifies."""
    return (
        target.isNotNull()
        & direction_correct(target, predicted, direction)
        & difference_over_threshold(target, predicted, unit, threshold)
    )


def past_due(base: Column, period_minutes: Column, now: Column) -> Column:
    """Scheduler due-date rule (src/utils/date_utils.ts:5-28): true when
    ``base + period`` has elapsed at ``now``; a missing base or period
    is always due (first run / unconfigured = run now). ``now`` is
    injected, never Date.now(), so plans stay deterministic/testable.
    """
    due = base.cast("timestamp") + F.make_interval(
        mins=period_minutes.cast("int")
    )
    return base.isNull() | period_minutes.isNull() | (due <= now)


def sanitize_queue_name(*parts: Column, limit: int = 75) -> Column:
    """F16 — queue-name sanitize (contexts_queuer.ts:66-78): join the
    parts with '_', strip every character outside [a-zA-Z0-9_], and
    truncate to the AWS-safe length (75 < the 80 limit). Case is
    preserved (the reference's slugify call runs without the lower
    option on an already-alphanumeric string)."""
    joined = F.concat_ws("_", *parts)
    return F.substring(
        F.regexp_replace(joined, r"[^a-zA-Z0-9_]", ""), 1, limit
    )
