"""Ordered-per-key / time-series queries (SURVEY.md 2.5, 2.9) over the
``events`` table: user_id plays workItemId, ts the revision changedDate,
event_type the status.

These exercise the window-function heart of the engine: consecutive
dedupe (A2/W10), flagged-interval propagation (W7), filler counts
(W12), sessionization, tumbling windows (ST7) and the simplified
event-date pass (W2-lite; the exact lookahead pass is the
applyInPandas operator tested in tests/test_event_dates.py).

Scale note: every window here partitions by user_id — one shuffle on
the natural key, then per-partition sorted scans; no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.session import perf_checkpoint
from falcon_metrics_etl_spark.sources import load_table

_MICROS_PER_DAY = 86_400_000_000
_MICROS_30_MIN = 1_800_000_000


# --------------------------------------------------------------------------
# A2/W10 — consecutive-duplicate dedupe (keep first of each run)
# --------------------------------------------------------------------------
@register(
    "revision_dedupe",
    doc="A2/W10 consecutive dedupe: keep only revisions whose status differs "
    "from the previous one per item (src/azureboards/data/"
    "revision_utils.ts:73-107, src/kanbanize/transform_processor.ts:293-312)",
    tags=("window", "dedupe"),
    oracle="""
SELECT event_id, user_id, event_type
FROM (
    SELECT event_id, user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
) t
WHERE prev_type IS NULL OR prev_type <> event_type
""",
)
def revision_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
        )
        .select("event_id", "user_id", "event_type")
    )


# --------------------------------------------------------------------------
# W7 — flagged-interval propagation
# --------------------------------------------------------------------------
@register(
    "flag_intervals",
    doc="W7 flagged-interval propagation: a flag ('error') keeps the item "
    "flagged until the matching unflag ('purchase'); running flag balance "
    "over the per-item ordered history (src/jiracloud/process/utils.ts:13-116)",
    tags=("window",),
    oracle="""
SELECT event_id, user_id,
       SUM(CASE WHEN event_type = 'error' THEN 1
                WHEN event_type = 'purchase' THEN -1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
           AS flagged
FROM events
""",
)
def flag_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    balance = F.sum(
        F.when(F.col("event_type") == "error", 1)
        .when(F.col("event_type") == "purchase", -1)
        .otherwise(0)
    ).over(w)
    return events.select("event_id", "user_id", (balance > 0).alias("flagged"))


# --------------------------------------------------------------------------
# W12 — daily filler counts (gap densification size)
# --------------------------------------------------------------------------
@register(
    "daily_filler_counts",
    doc="W12 filler count = floor(time-to-next-revision / 24h) per item "
    "(src/jiracloud/process/utils.ts:131-157); integer microsecond math so "
    "Spark and DuckDB agree exactly",
    tags=("window", "date"),
    oracle=f"""
SELECT event_id, user_id,
       (LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        - epoch_us(ts)) // {_MICROS_PER_DAY} AS fillers
FROM events
""",
)
def daily_filler_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    next_us = F.lead(us).over(w)
    return events.select(
        "event_id",
        "user_id",
        ((next_us - us) / F.lit(_MICROS_PER_DAY)).cast("long").alias("fillers"),
    )


@register(
    "filler_counts_typed",
    doc="W12 exact filler counts with the reference's type gating "
    "(getFillersCount, jiracloud/process/utils.ts:131-157): only "
    "state_change/flagged revisions fill, the gap runs to the NEXT "
    "revision of those types (blocked/discarded rows are skipped, not "
    "boundaries), count = floor(hours/24). Revision types synthesized "
    "deterministically from the activity stream.",
    tags=("window", "date", "parity"),
    oracle=f"""
WITH revs AS (
    SELECT event_id, user_id, ts,
           CASE event_id % 5 WHEN 1 THEN 'blocked_reason'
                WHEN 2 THEN 'flagged' WHEN 3 THEN 'discarded_reason'
                ELSE 'state_change' END AS type
    FROM events
),
nexts AS (
    SELECT *,
           MIN(CASE WHEN type IN ('state_change', 'flagged')
                    THEN epoch_us(ts) END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
           ) AS next_allowed_us
    FROM revs
)
SELECT event_id, user_id, type,
       CASE WHEN type IN ('state_change', 'flagged')
                 AND next_allowed_us IS NOT NULL
            THEN (next_allowed_us - epoch_us(ts)) // {_MICROS_PER_DAY}
            ELSE 0 END AS fillers
FROM nexts
""",
)
def filler_counts_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.revisions import filler_counts

    events = load_table(spark, sf_dir, "events")
    typed = events.select(
        "event_id",
        "user_id",
        F.col("ts").alias("changed_date"),
        F.element_at(
            F.array(
                F.lit("state_change"),
                F.lit("blocked_reason"),
                F.lit("flagged"),
                F.lit("discarded_reason"),
                F.lit("state_change"),
            ),
            (F.col("event_id") % 5 + 1).cast("int"),
        ).alias("type"),
    )
    counted = filler_counts(
        typed,
        item_col="user_id",
        date_col="changed_date",
        order_cols=("changed_date", "event_id"),
    )
    return counted.select("event_id", "user_id", "type", "fillers")


# --------------------------------------------------------------------------
# Sessionization — gap > 30 min starts a new session
# --------------------------------------------------------------------------
@register(
    "sessionization",
    doc="Sessionization: lag-gap > 30 min opens a session; sessions per user "
    "(classic lag+cumsum; streaming twin is session_window in "
    "streaming/windows.py)",
    tags=("window", "aggregate"),
    oracle=f"""
WITH gaps AS (
    SELECT user_id,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                    > {_MICROS_30_MIN}
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM gaps GROUP BY 1
""",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    new_session = F.when(
        prev_us.isNull() | ((us - prev_us) > _MICROS_30_MIN), 1
    ).otherwise(0)
    return (
        events.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# ST7 — tumbling daily window aggregate
# --------------------------------------------------------------------------
@register(
    "tumbling_daily",
    doc="ST7 tumbling evaluation windows: daily count + exact value sum per "
    "event type (fl_insights.ts:72-113); value summed in exact integer "
    "cents with one final division to double",
    tags=("aggregate", "date"),
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n,
       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events
GROUP BY 1, 2
""",
)
def tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias(
            "total_value"
        ),
    )


# --------------------------------------------------------------------------
# W2-lite — simplified event-date extraction (first zone entry)
# --------------------------------------------------------------------------
@register(
    "event_dates_simple",
    doc="W2-lite event dates: first entry into the arrival/commitment/"
    "departure zones per item + W4 state category; the exact lookahead "
    "semantics are the applyInPandas operator (operators/event_dates.py) "
    "verified by the ported reference scenario tests",
    tags=("aggregate", "workflow"),
    oracle="""
WITH ranked AS (
    SELECT user_id,
           CASE event_type WHEN 'signup' THEN 0 WHEN 'view' THEN 1
                WHEN 'click' THEN 2 WHEN 'error' THEN 2
                WHEN 'purchase' THEN 3 END AS step_order,
           ts
    FROM events
),
dates AS (
    SELECT user_id,
           MIN(CASE WHEN step_order >= 1 THEN ts END) AS arrival_date,
           MIN(CASE WHEN step_order >= 2 THEN ts END) AS commitment_date,
           MIN(CASE WHEN step_order >= 3 THEN ts END) AS departure_date
    FROM ranked GROUP BY 1
)
SELECT user_id, arrival_date, commitment_date, departure_date,
       CASE WHEN departure_date IS NOT NULL THEN 'completed'
            WHEN commitment_date IS NOT NULL THEN 'inprogress'
            WHEN arrival_date IS NOT NULL THEN 'proposed'
            ELSE 'preceding' END AS state_category
FROM dates
""",
)
def event_dates_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.event_dates import (
        first_entry_event_dates,
        state_category_from_dates,
    )

    events = load_table(spark, sf_dir, "events")
    step_order = (
        F.when(F.col("event_type") == "signup", 0)
        .when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "purchase", 3)
    )
    revisions = events.select(
        F.col("user_id").alias("work_item_id"),
        step_order.alias("step_order"),
        F.col("ts").alias("changed_date"),
    )
    dates = first_entry_event_dates(
        revisions,
        item_col="work_item_id",
        order_col="step_order",
        date_col="changed_date",
        arrival_point=1,
        commitment_point=2,
        departure_point=3,
    )
    return dates.select(
        F.col("work_item_id").alias("user_id"),
        "arrival_date",
        "commitment_date",
        "departure_date",
        state_category_from_dates().alias("state_category"),
    )


# --------------------------------------------------------------------------
# Funnel analysis — ordered multi-stage conversion per user
# --------------------------------------------------------------------------
_FUNNEL = ("signup", "view", "purchase")


@register(
    "funnel_conversion",
    doc="Ordered funnel (signup -> view -> purchase): each stage's entry "
    "time is the first qualifying event AT OR AFTER the previous stage's "
    "entry. r7 fused plan, TWO shuffles total (was 8 as three "
    "join+agg stages): ONE hash shuffle on user_id feeds three "
    "CHAINED unordered window passes (conditional min per user; each "
    "stage's predicate references the previous stage's window output, "
    "and same-partitioning windows with no ordering chain without new "
    "Exchange or Sort), a per-user rollup that reuses the window "
    "partitioning, then the single-row global count/rate aggregate.",
    tags=("aggregate", "window", "funnel", "timeseries"),
    oracle=f"""
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = '{_FUNNEL[0]}' GROUP BY 1
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = '{_FUNNEL[1]}' AND e.ts >= s1.t1
    GROUP BY 1
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = '{_FUNNEL[2]}' AND e.ts >= s2.t2
    GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM s1) AS n_{_FUNNEL[0]},
       (SELECT COUNT(*) FROM s2) AS n_{_FUNNEL[1]},
       (SELECT COUNT(*) FROM s3) AS n_{_FUNNEL[2]},
       ROUND((SELECT COUNT(*) FROM s2) * 1.0 / (SELECT COUNT(*) FROM s1), 4)
           AS rate_{_FUNNEL[1]},
       ROUND((SELECT COUNT(*) FROM s3) * 1.0 / (SELECT COUNT(*) FROM s2), 4)
           AS rate_{_FUNNEL[2]}
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    staged = (
        events.withColumn(
            "t1",
            F.min(
                F.when(F.col("event_type") == _FUNNEL[0], F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == _FUNNEL[1])
                    & (F.col("ts") >= F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == _FUNNEL[2])
                    & (F.col("ts") >= F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("t1").alias("t1"),
        F.first("t2").alias("t2"),
        F.first("t3").alias("t3"),
    )
    counts = per_user.agg(
        F.count("t1").alias(f"n_{_FUNNEL[0]}"),
        F.count("t2").alias(f"n_{_FUNNEL[1]}"),
        F.count("t3").alias(f"n_{_FUNNEL[2]}"),
    )
    return counts.select(
        "*",
        F.round(
            F.col(f"n_{_FUNNEL[1]}") * 1.0 / F.col(f"n_{_FUNNEL[0]}"), 4
        ).alias(f"rate_{_FUNNEL[1]}"),
        F.round(
            F.col(f"n_{_FUNNEL[2]}") * 1.0 / F.col(f"n_{_FUNNEL[1]}"), 4
        ).alias(f"rate_{_FUNNEL[2]}"),
    )


RETENTION_MAX_WEEKS = 3


@register(
    "cohort_retention_weekly",
    doc="Weekly cohort retention triangle: users cohorted by the week "
    "of their first signup, marked active in each later week they have "
    "any event; one distinct-activity aggregation + one broadcast-"
    "joinable cohort dim -> (cohort_week, week_offset) retention grid",
    tags=("aggregate", "join", "cohort", "timeseries"),
    oracle=f"""
WITH first_seen AS (
    SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
    FROM events WHERE event_type = 'signup' GROUP BY 1
),
cohort_sizes AS (
    SELECT cohort_week, COUNT(*) AS cohort_size FROM first_seen GROUP BY 1
),
activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
    FROM events
),
marked AS (
    SELECT f.cohort_week,
           datediff('day', f.cohort_week, a.active_week) // 7 AS week_offset,
           a.user_id
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    WHERE datediff('day', f.cohort_week, a.active_week) // 7
          BETWEEN 0 AND {RETENTION_MAX_WEEKS}
),
grid AS (
    SELECT cohort_week, week_offset,
           COUNT(DISTINCT user_id) AS n_active
    FROM marked GROUP BY 1, 2
)
SELECT g.cohort_week, CAST(g.week_offset AS INT) AS week_offset,
       g.n_active, s.cohort_size,
       ROUND(g.n_active * 1.0 / s.cohort_size, 4) AS retention_rate
FROM grid g JOIN cohort_sizes s ON g.cohort_week = s.cohort_week
""",
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10 fusion (was the worst plan in PLAN_AUDIT_r10 at 6
    shuffles): ONE user-keyed aggregation over ONE events scan
    carries both the cohort week (min signup ts) and the distinct
    active-week set — the old plan scanned events twice and paid a
    user_id join plus an expensive COUNT(DISTINCT). Distinct weeks
    map to distinct offsets (both are week-aligned), so each user
    hits a (cohort, offset) cell at most once and the grid count is
    a plain algebraic count(*). 3 executed shuffles: the per-user
    agg (checkpointed — feeds grid AND sizes), the grid agg, the
    sizes agg; the final join broadcasts. Per-user state is the
    distinct-week set, bounded by the timeline length in weeks."""
    events = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    per_user = perf_checkpoint(
        events.groupBy("user_id")
        .agg(
            F.date_trunc(
                "week",
                F.min(
                    F.when(F.col("event_type") == "signup", F.col("ts"))
                ),
            )
            .cast("date")
            .alias("cohort_week"),
            F.collect_set(wk).alias("weeks"),
        )
        .filter(F.col("cohort_week").isNotNull())
    )
    cohort_sizes = per_user.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    offset = F.floor(
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    )
    marked = (
        per_user.select(
            "cohort_week", F.explode("weeks").alias("active_week")
        )
        .withColumn("week_offset", offset)
        .filter(
            (F.col("week_offset") >= 0)
            & (F.col("week_offset") <= RETENTION_MAX_WEEKS)
        )
    )
    grid = marked.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return grid.join(F.broadcast(cohort_sizes), "cohort_week").select(
        "cohort_week",
        F.col("week_offset").cast("int").alias("week_offset"),
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") * 1.0 / F.col("cohort_size"), 4).alias(
            "retention_rate"
        ),
    )


ANOMALY_Z = 2.0


@register(
    "daily_count_anomalies",
    doc="Ops anomaly detection: daily event counts per type flagged "
    "where |count - mean| > 2 sigma. Mean/variance come from exact "
    "integer SUM and SUM-of-squares (population variance as a single "
    "double expression over exact ints — order-independent, unlike a "
    "naive double stddev aggregate), so the flags hash-match across "
    "engines",
    tags=("aggregate", "window", "timeseries", "quality"),
    oracle=f"""
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type,
           COUNT(*) AS n_days,
           SUM(n) AS s1,
           SUM(n * n) AS s2
    FROM daily GROUP BY 1
)
SELECT d.event_type, d.day, d.n,
       ROUND(CAST(s.s1 AS DOUBLE) / s.n_days, 4) AS mean_n,
       ROUND(sqrt(CAST(s.s2 AS DOUBLE) / s.n_days
                  - (CAST(s.s1 AS DOUBLE) / s.n_days)
                    * (CAST(s.s1 AS DOUBLE) / s.n_days)), 4) AS sigma,
       (ABS(d.n - CAST(s.s1 AS DOUBLE) / s.n_days)
        > {ANOMALY_Z} * sqrt(CAST(s.s2 AS DOUBLE) / s.n_days
                  - (CAST(s.s1 AS DOUBLE) / s.n_days)
                    * (CAST(s.s1 AS DOUBLE) / s.n_days))) AS is_anomaly
FROM daily d JOIN stats s ON d.event_type = s.event_type
""",
)
def daily_count_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_days")
    var = F.col("s2").cast("double") / F.col("n_days") - mean * mean
    sigma = F.sqrt(var)
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "n",
        F.round(mean, 4).alias("mean_n"),
        F.round(sigma, 4).alias("sigma"),
        (F.abs(F.col("n") - mean) > ANOMALY_Z * sigma).alias("is_anomaly"),
    )


@register(
    "rolling_7day_event_counts",
    doc="Rolling 7-day event volume per type: RANGE frame over days "
    "(interval-bounded window — counts stay exact integers so the "
    "rolling sum and its day-over-day delta hash-match; days missing "
    "from the data contribute zero by construction of the RANGE frame, "
    "no densification needed)",
    tags=("window", "timeseries", "range-frame"),
    oracle="""
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       CAST(SUM(n) OVER (
           PARTITION BY event_type ORDER BY day
           RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS rolling_7d,
       CAST(n - lag(n) OVER (
           PARTITION BY event_type ORDER BY day
       ) AS BIGINT) AS day_over_day
FROM daily
""",
)
def rolling_7day_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    # RANGE frame over days: order by the day-number (unix_date) so
    # rangeBetween(-6, 0) is the calendar week — pure DataFrame API
    # (a fixed-name temp view here would be shared session state and
    # race under concurrent definition)
    wrange = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, Window.currentRow)
    )
    wlag = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(wrange).cast("long").alias("rolling_7d"),
        (F.col("n") - F.lag("n").over(wlag)).cast("long").alias("day_over_day"),
    )


@register(
    "user_active_streaks",
    doc="Gaps-and-islands: longest run of consecutive active days per "
    "user — island id = day minus row_number (constant within a "
    "consecutive run), then max island length; one sort per user "
    "serves both window passes",
    tags=("window", "timeseries", "gaps-islands"),
    oracle="""
WITH days AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events
),
islands AS (
    SELECT user_id, day,
           day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day
           ) AS INT) AS island
    FROM days
),
runs AS (
    SELECT user_id, island, COUNT(*) AS streak_len
    FROM islands GROUP BY 1, 2
)
SELECT user_id,
       CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
       CAST(SUM(streak_len) AS BIGINT) AS n_active_days
FROM runs GROUP BY 1
""",
)
def user_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island", F.date_sub("day", F.row_number().over(w))
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return runs.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.sum("streak_len").alias("n_active_days"),
    )
