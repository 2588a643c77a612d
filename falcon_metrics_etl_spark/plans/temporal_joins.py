"""Temporal-join queries: as-of and bucketed range joins over the
events stream (operators/asof.py). DuckDB's native ASOF JOIN is the
oracle for the as-of path; a plain inequality join oracles the range
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.asof import (
    asof_join,
    range_join_bucketed,
)
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.sources import load_table


@register(
    "asof_last_view_before_purchase",
    doc="As-of join (operators/asof.py::asof_join): each purchase "
    "matched to the user's latest view at-or-before it — union + "
    "last-non-null-struct window, one shuffle on the key, "
    "O((N+M) log) per key instead of the naive O(N*M) inequality "
    "join. Oracle: DuckDB native ASOF LEFT JOIN.",
    tags=("join", "asof", "window"),
    oracle="""
WITH purchases AS (
    SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
),
views AS (
    SELECT user_id, ts, MAX(event_id) AS view_event_id
    FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT p.user_id, p.event_id, p.ts, v.view_event_id
FROM purchases p
ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
""",
)
def asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    return asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts"
    ).select("user_id", "event_id", "ts", "view_event_id")


@register(
    "range_join_error_windows",
    doc="Bucketed range join (operators/asof.py::range_join_bucketed): "
    "clicks matched to the 1-day maintenance window opened by each "
    "error event — intervals explode onto a day grid, equi-join on "
    "(user, cell), exact [start,end) filter after; a shuffled hash "
    "join instead of BroadcastNestedLoopJoin. Oracle: plain "
    "inequality join.",
    tags=("join", "range", "interval"),
    oracle="""
WITH clicks AS (
    SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
),
wins AS (
    SELECT user_id, event_id AS win_id, ts AS start_ts,
           ts + INTERVAL 1 DAY AS end_ts
    FROM events WHERE event_type = 'error'
)
SELECT c.user_id, c.event_id, c.ts, w.win_id
FROM clicks c JOIN wins w
  ON c.user_id = w.user_id AND c.ts >= w.start_ts AND c.ts < w.end_ts
""",
)
def range_join_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    wins = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("win_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("end_ts"),
    )
    return range_join_bucketed(
        clicks, wins, ["user_id"], "ts", "start_ts", "end_ts", bucket="1 day"
    ).select("user_id", "event_id", "ts", "win_id")
