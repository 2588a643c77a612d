"""Flow-metric aggregates — SURVEY.md A3-A7.

The reference computes these per (context, evaluation window) and
persists them as insights/checkpoints snapshots
(/root/reference/src/flomatika_app/process/
extract_flomatika_insights_processor.ts:38-200). Here they are
first-class distributed queries over states/snapshots-shaped frames.

Determinism notes for the DuckDB oracle: percentiles use the discrete
definition (``percentile_disc`` — returns an actual data point, so no
float interpolation ambiguity); sums of money go through
DECIMAL(18,2) and are cast to DOUBLE at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def percentile_disc(col: str, q: float, cast_to: str = "long"):
    """Discrete percentile (actual data point) — matches DuckDB quantile_disc.

    Spark returns DOUBLE; for integer-valued inputs we cast back so the
    engine and the oracle agree on type (DuckDB keeps the input type).
    """
    expr = F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY {col})")
    return expr.cast(cast_to) if cast_to else expr


def lead_time_metrics(
    items: DataFrame,
    group_cols: list[str],
    commitment_col: str = "commitment_date",
    departure_col: str = "departure_date",
) -> DataFrame:
    """85th-percentile + average lead time per group (A7).

    Lead time = whole days from commitment to departure, computed only
    over departed items. The groupBy pre-aggregates map-side; the
    percentile is exact but runs on the already-grouped shuffle.
    """
    lead = F.datediff(F.col(departure_col), F.col(commitment_col))
    departed = items.filter(
        F.col(departure_col).isNotNull() & F.col(commitment_col).isNotNull()
    ).withColumn("lead_time_days", lead)
    return departed.groupBy(*group_cols).agg(
        percentile_disc("lead_time_days", 0.85).alias("lead_time_p85"),
        F.round(F.avg("lead_time_days"), 2).alias("lead_time_avg"),
        F.count(F.lit(1)).alias("n_items"),
    )


def throughput(
    items: DataFrame,
    group_cols: list[str],
    departure_col: str = "departure_date",
    grain: str = "week",
) -> DataFrame:
    """Departures per time bucket per group (A7 throughput)."""
    bucket = F.date_trunc(grain, F.col(departure_col)).cast("date")
    return (
        items.filter(F.col(departure_col).isNotNull())
        .groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("throughput"))
    )


def arrival_rate_quantiles(
    items: DataFrame,
    arrival_col: str = "arrival_date",
) -> DataFrame:
    """Productivity quantiles (A3): min + quartiles of weekly arrival counts.

    Two-level aggregation: week counts first (map-side combinable),
    then a single-group quantile over the tiny weekly series.
    """
    weekly = (
        items.filter(F.col(arrival_col).isNotNull())
        .groupBy(F.date_trunc("week", F.col(arrival_col)).cast("date").alias("week"))
        .agg(F.count(F.lit(1)).alias("weekly_count"))
    )
    return weekly.agg(
        F.min("weekly_count").alias("min_weekly"),
        percentile_disc("weekly_count", 0.25).alias("q1"),
        percentile_disc("weekly_count", 0.50).alias("q2"),
        percentile_disc("weekly_count", 0.75).alias("q3"),
    )


def class_of_service_share(
    items: DataFrame,
    class_col: str,
) -> DataFrame:
    """Class-of-service distribution as percentages (A4): one row per
    class with count and share; the expedite share is the row whose
    class equals the org's expedite value (the caller filters — the
    full distribution is what the reference's widget renders)."""
    counts = items.groupBy(F.col(class_col).alias("class_of_service")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = Window.partitionBy()
    return counts.select(
        "class_of_service",
        "n",
        F.round(F.col("n") * 100.0 / F.sum("n").over(total), 2).alias("pct"),
    )


def profile_of_work(items: DataFrame, tag_col: str, key_col: str) -> DataFrame:
    """Per-tag value-share percentages rounded to 2dp (A5)."""
    counts = items.groupBy(
        F.col(tag_col).alias("tag"), F.col(key_col).alias("key")
    ).agg(F.count(F.lit(1)).alias("n"))
    per_tag = Window.partitionBy("tag")
    return counts.select(
        "tag",
        "key",
        F.round(F.col("n") * 100.0 / F.sum("n").over(per_tag), 2).alias("pct"),
    )


def flow_debt(metrics: DataFrame, wip_age_col: str, lead_time_col: str) -> DataFrame:
    """Flow debt = 100 * wipAge85 / leadTime85 with 0-guards (A6)."""
    return metrics.withColumn(
        "flow_debt",
        F.when(
            (F.col(lead_time_col).isNull()) | (F.col(lead_time_col) == 0), F.lit(None)
        ).otherwise(F.round(F.col(wip_age_col) * 100.0 / F.col(lead_time_col), 2)),
    )


def wip_as_of(
    items: DataFrame,
    as_of,
    group_cols: list[str],
    commitment_col: str = "commitment_date",
    departure_col: str = "departure_date",
) -> DataFrame:
    """WIP count + age-percentile as of a date (A7 WIP / WIP age).

    WIP = committed on or before `as_of` and not yet departed by it.
    A pure filter + aggregate: no window, no shuffle beyond the group.
    """
    as_of_col = F.lit(as_of).cast("date")
    in_progress = items.filter(
        F.col(commitment_col).isNotNull()
        & (F.to_date(F.col(commitment_col)) <= as_of_col)
        & (
            F.col(departure_col).isNull()
            | (F.to_date(F.col(departure_col)) > as_of_col)
        )
    ).withColumn("wip_age_days", F.datediff(as_of_col, F.to_date(F.col(commitment_col))))
    return in_progress.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("wip_count"),
        percentile_disc("wip_age_days", 0.85).alias("wip_age_p85"),
        F.round(F.avg("wip_age_days"), 2).alias("wip_age_avg"),
    )
