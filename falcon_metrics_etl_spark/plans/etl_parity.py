"""Remaining reference-parity operators surfaced as oracle-checked
queries: linked-items translation (F10), conditional field mapping
(F17), transition compression (W10), flow efficiency (A7), nested
VC commits (S6), the insights-snapshot gold rollup (3.3 lifecycle),
and threshold forecasting (notifications F6).

Data mapping follows FIXTURES.md section 4: orders are work items /
merge requests, lineitem rows are their revisions / commits, events
is the activity stream, o_orderpriority is the class-of-service
"context" dimension.

Scale notes: every query here is expressed with built-in column
functions (higher-order array fns, windows, broadcastable aggregates);
nothing leaves the JVM. The nested-commits query demonstrates the
collect/explode round-trip that GitLab MR->commits ingestion needs
(reference src/git_data_extractor/gitlab_extractor.ts:188-200) with a
single shuffle keyed on the parent id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions.field_mapper import apply_field_maps
from falcon_metrics_etl_spark.functions.linked_items import translate_linked_items
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.sources import load_table

# threshold-forecast parameters (notifications math, F6)
SLE_TARGET_DAYS = 60
SLE_THRESHOLD_DAYS = 7


# --------------------------------------------------------------------------
# F10 — linked-items translation (higher-order fn over array<struct>)
# --------------------------------------------------------------------------
@register(
    "linked_items_translation",
    doc="F10 linked-items translation: per work item (order), its line "
    "items form an issuelinks-style array<struct<type{outward,inward}, "
    "outwardIssue{key}, inwardIssue{key}>> (odd line numbers outward, "
    "even inward); translate_linked_items picks direction name + target "
    "key via transform()/filter() HOFs, then the edge table is exploded "
    "back out. Behavioral twin of translate_linked_items.ts:3-42.",
    tags=("array", "hof", "explode"),
    oracle="""
SELECT CAST(l_orderkey AS VARCHAR) AS work_item_id,
       CASE WHEN l_linenumber % 2 = 1 THEN 'blocks' ELSE 'is blocked by' END
           AS link_type,
       CAST(l_partkey AS VARCHAR) AS linked_work_item_id
FROM lineitem
WHERE l_linenumber % 2 = 1 OR l_suppkey % 10 <> 0
""",
)
def linked_items_translation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    outward = F.col("l_linenumber") % 2 == 1
    # even links with suppkey % 10 == 0 get NO target at all -> the
    # translator must drop them (the reference's null-link case)
    has_inward = F.col("l_suppkey") % 10 != 0
    link = F.struct(
        F.struct(
            F.when(outward, F.lit("blocks")).alias("outward"),
            F.when(~outward, F.lit("is blocked by")).alias("inward"),
        ).alias("type"),
        F.when(
            outward, F.struct(F.col("l_partkey").cast("string").alias("key"))
        ).alias("outwardIssue"),
        F.when(
            ~outward & has_inward,
            F.struct(F.col("l_partkey").cast("string").alias("key")),
        ).alias("inwardIssue"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(link).alias("issuelinks")
    )
    translated = nested.select(
        F.col("l_orderkey").cast("string").alias("work_item_id"),
        translate_linked_items(F.col("issuelinks")).alias("linkedItems"),
    )
    return translated.select(
        "work_item_id", F.explode("linkedItems").alias("li")
    ).select(
        "work_item_id",
        F.col("li.type").alias("link_type"),
        F.col("li.workItemId").alias("linked_work_item_id"),
    )


# --------------------------------------------------------------------------
# F17 — config-driven conditional field mapping
# --------------------------------------------------------------------------
_FIELD_MAPS = [
    # every map executes in order; the LAST match wins per destination
    # (reference chain semantics), and a conditionless map never fires
    {
        "srcField": "o_orderpriority",
        "dstField": "sla_class",
        "conditions": {"o_orderstatus": "F"},
    },
    {
        "srcField": "o_orderstatus",
        "dstField": "sla_class",
        "conditions": {"o_orderstatus": "F", "o_orderpriority": "1-URGENT"},
    },
    {"srcField": "o_clerk", "dstField": "sla_class", "conditions": {}},
]


@register(
    "field_mapper_conditional",
    doc="F17 chain-of-responsibility field mapper: every config map "
    "executes in order, src->dst iff all equality conditions hold, "
    "LAST match wins, conditionless maps fire nothing; config compiles "
    "to one chained when()/otherwise() Catalyst expression "
    "(field_mapper.ts:1-101, fieldMaps DDL 391-401)",
    tags=("expression", "config"),
    oracle="""
SELECT CAST(o_orderkey AS VARCHAR) AS work_item_id,
       CASE WHEN o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
                THEN o_orderstatus
            WHEN o_orderstatus = 'F' THEN o_orderpriority
       END AS sla_class
FROM orders
""",
)
def field_mapper_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mapped = apply_field_maps(orders, _FIELD_MAPS)
    return mapped.select(
        F.col("o_orderkey").cast("string").alias("work_item_id"), "sla_class"
    )


# --------------------------------------------------------------------------
# W10 — transition compression (keep only rows that change state)
# --------------------------------------------------------------------------
@register(
    "transition_compression",
    doc="W10 Kanbanize transition compression: per user ordered by "
    "(ts, event_id), keep an event only when event_type differs from "
    "the previous one — lag() window dedupe, single shuffle on user_id "
    "(transform_processor.ts:293-312)",
    tags=("window", "dedupe"),
    oracle="""
WITH w AS (
    SELECT user_id, event_id, ts, event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
)
SELECT user_id, event_id, ts, event_type
FROM w WHERE prev_type IS NULL OR prev_type <> event_type
""",
)
def transition_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    return (
        ev.withColumn("prev_type", prev)
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "event_id", "ts", "event_type")
    )


# --------------------------------------------------------------------------
# A7 — flow efficiency (active time / total time)
# --------------------------------------------------------------------------
@register(
    "flow_efficiency",
    doc="A7 flow efficiency: revision durations via lead(changed_date) "
    "per item; active time = days spent in the commitment zone ('A' "
    "revisions), total = arrival->departure span; ratio averaged per "
    "class of service. One window + one aggregate, both keyed on the "
    "item -> single shuffle.",
    tags=("window", "aggregate", "join"),
    oracle="""
WITH revs AS (
    SELECT l_orderkey,
           CAST(l_shipdate AS TIMESTAMP) AS changed_date,
           l_linenumber * 4
             + CASE l_returnflag WHEN 'N' THEN 1 WHEN 'A' THEN 2 ELSE 3 END
             AS revision,
           l_returnflag AS state
    FROM lineitem
),
seq AS (
    SELECT l_orderkey, state, changed_date,
           LEAD(changed_date) OVER (PARTITION BY l_orderkey
                                    ORDER BY changed_date, revision) AS next_date
    FROM revs
),
per_item AS (
    SELECT l_orderkey,
           SUM(CASE WHEN state = 'A' AND next_date IS NOT NULL
                    THEN datediff('day', CAST(changed_date AS DATE),
                                  CAST(next_date AS DATE)) ELSE 0 END)
               AS active_days,
           datediff('day', MIN(CAST(changed_date AS DATE)),
                    MAX(CAST(changed_date AS DATE))) AS total_days
    FROM seq GROUP BY 1
)
SELECT o.o_orderpriority AS class_of_service,
       COUNT(*) AS n_items,
       ROUND(CAST(SUM(p.active_days) AS DOUBLE)
             / NULLIF(CAST(SUM(p.total_days) AS DOUBLE), 0) * 100, 2)
           AS flow_efficiency_pct
FROM per_item p
JOIN orders o ON o.o_orderkey = p.l_orderkey
GROUP BY 1
""",
)
def flow_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    revs = li.select(
        "l_orderkey",
        F.col("l_shipdate").alias("changed_date"),
        (
            F.col("l_linenumber") * 4
            + F.when(F.col("l_returnflag") == "N", 1)
            .when(F.col("l_returnflag") == "A", 2)
            .otherwise(3)
        ).alias("revision"),
        F.col("l_returnflag").alias("state"),
    )
    w = Window.partitionBy("l_orderkey").orderBy("changed_date", "revision")
    seq = revs.withColumn("next_date", F.lead("changed_date").over(w))
    active = F.when(
        (F.col("state") == "A") & F.col("next_date").isNotNull(),
        F.datediff(F.to_date("next_date"), F.to_date("changed_date")),
    ).otherwise(F.lit(0))
    per_item = seq.groupBy("l_orderkey").agg(
        F.sum(active).alias("active_days"),
        F.datediff(
            F.max(F.to_date("changed_date")), F.min(F.to_date("changed_date"))
        ).alias("total_days"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("class_of_service")
    )
    joined = per_item.join(orders, per_item.l_orderkey == orders.o_orderkey)
    ratio = (
        F.sum("active_days").cast("double")
        / F.nullif(F.sum("total_days").cast("double"), F.lit(0.0))
        * 100
    )
    return joined.groupBy("class_of_service").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(ratio, 2).alias("flow_efficiency_pct"),
    )


# --------------------------------------------------------------------------
# S6 — GitLab nested MR->commits: collect/explode round-trip
# --------------------------------------------------------------------------
@register(
    "vc_nested_commits",
    doc="S6 GitLab MR->commits flatten: commits (lineitem) nest under "
    "their merge request (order) as a sorted array<struct>, the shape "
    "the GraphQL source delivers; the engine flattens with explode() "
    "and keeps per-MR stats from the array (gitlab_extractor.ts:188-200). "
    "One shuffle keyed on the parent id; array size audits the nesting.",
    tags=("array", "explode", "aggregate"),
    oracle="""
SELECT CAST(l.l_orderkey AS VARCHAR) AS mr_id,
       COUNT(*) OVER (PARTITION BY l.l_orderkey) AS n_commits,
       CAST(l.l_partkey AS VARCHAR) AS commit_sha,
       l.l_shipdate AS committed_at,
       o.o_orderstatus AS mr_state
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
""",
)
def vc_nested_commits(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    commit = F.struct(
        F.col("l_partkey").cast("string").alias("sha"),
        F.col("l_shipdate").alias("committed_at"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(commit)).alias("commits")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderstatus").alias("mr_state")
    )
    mrs = nested.join(orders, nested.l_orderkey == orders.o_orderkey)
    return mrs.select(
        F.col("l_orderkey").cast("string").alias("mr_id"),
        F.size("commits").cast("long").alias("n_commits"),
        F.explode("commits").alias("c"),
        "mr_state",
    ).select(
        "mr_id",
        "n_commits",
        F.col("c.sha").alias("commit_sha"),
        F.col("c.committed_at").alias("committed_at"),
        "mr_state",
    )


# --------------------------------------------------------------------------
# 3.3 — insights snapshot rollup (gold table: one row per context)
# --------------------------------------------------------------------------
@register(
    "insights_snapshot",
    doc="Insights-snapshot gold rollup (lifecycle 3.3): per class-of-"
    "service context, lead time p85/avg + throughput + expedite share "
    "+ arrival-rate quartiles combined into one row — the engine-side "
    "replacement for the reference's 9 parallel metric-API calls "
    "(extract_flomatika_insights_processor.ts:328-473). Four small "
    "aggregates broadcast-joined on the 5-row context dim.",
    tags=("aggregate", "join", "percentile", "gold"),
    oracle="""
WITH items AS (
    SELECT o.o_orderpriority AS class_of_service,
           datediff('day', CAST(o.o_orderdate AS DATE),
                    CAST(l.l_shipdate AS DATE)) AS lead_days,
           CAST(l.l_shipdate AS DATE) AS departure_date
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
lead AS (
    SELECT class_of_service,
           percentile_disc(0.85) WITHIN GROUP (ORDER BY lead_days) AS lead_time_p85,
           ROUND(CAST(SUM(lead_days) AS DOUBLE) / COUNT(*), 2) AS lead_time_avg,
           COUNT(*) AS throughput_total
    FROM items GROUP BY 1
),
weekly AS (
    SELECT class_of_service, date_trunc('week', departure_date) AS wk,
           COUNT(*) AS n
    FROM items GROUP BY 1, 2
),
arrivals AS (
    SELECT class_of_service,
           MIN(n) AS weekly_min,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY n) AS weekly_q1,
           percentile_disc(0.50) WITHIN GROUP (ORDER BY n) AS weekly_q2,
           percentile_disc(0.75) WITHIN GROUP (ORDER BY n) AS weekly_q3
    FROM weekly GROUP BY 1
),
expedite AS (
    SELECT o_orderpriority AS class_of_service,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / (SELECT COUNT(*) FROM orders) * 100, 2) AS class_share_pct
    FROM orders GROUP BY 1
)
SELECT l.class_of_service, l.lead_time_p85, l.lead_time_avg,
       l.throughput_total, a.weekly_min, a.weekly_q1, a.weekly_q2,
       a.weekly_q3, e.class_share_pct
FROM lead l
JOIN arrivals a ON a.class_of_service = l.class_of_service
JOIN expedite e ON e.class_of_service = l.class_of_service
""",
)
def insights_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.metrics import percentile_disc

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("departure_date")
    )
    items = li.join(
        orders.select(
            "o_orderkey",
            F.col("o_orderpriority").alias("class_of_service"),
            F.to_date("o_orderdate").alias("commitment_date"),
        ),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "class_of_service",
        F.datediff("departure_date", "commitment_date").alias("lead_days"),
        "departure_date",
    )
    lead = items.groupBy("class_of_service").agg(
        percentile_disc("lead_days", 0.85).alias("lead_time_p85"),
        F.round(F.sum("lead_days").cast("double") / F.count(F.lit(1)), 2).alias(
            "lead_time_avg"
        ),
        F.count(F.lit(1)).alias("throughput_total"),
    )
    weekly = items.groupBy(
        "class_of_service",
        F.date_trunc("week", "departure_date").alias("wk"),
    ).agg(F.count(F.lit(1)).alias("n"))
    arrivals = weekly.groupBy("class_of_service").agg(
        F.min("n").alias("weekly_min"),
        percentile_disc("n", 0.25).alias("weekly_q1"),
        percentile_disc("n", 0.50).alias("weekly_q2"),
        percentile_disc("n", 0.75).alias("weekly_q3"),
    )
    # each class's share of ALL orders — the '1-URGENT' row IS the A4
    # expedite share (a share computed within a group keyed by the
    # class itself would be a constant 100/0, information-free)
    wtot = Window.partitionBy()
    expedite = (
        orders.groupBy(F.col("o_orderpriority").alias("class_of_service"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "class_of_service",
            F.round(
                F.col("n").cast("double")
                / F.sum("n").over(wtot).cast("double")
                * 100,
                2,
            ).alias("class_share_pct"),
        )
    )
    return (
        lead.join(F.broadcast(arrivals), "class_of_service")
        .join(F.broadcast(expedite), "class_of_service")
        .select(
            "class_of_service",
            "lead_time_p85",
            "lead_time_avg",
            "throughput_total",
            "weekly_min",
            "weekly_q1",
            "weekly_q2",
            "weekly_q3",
            "class_share_pct",
        )
    )


# --------------------------------------------------------------------------
# F6 / notifications — threshold forecast evaluation
# --------------------------------------------------------------------------
@register(
    "threshold_forecast",
    doc=f"Threshold-subscription evaluation (notifications math, "
    f"evaluate_threshold_subscription.ts:35-109): per context, the p85 "
    f"lead-time forecast vs a {SLE_TARGET_DAYS}-day target; breach when "
    f"forecast > target + {SLE_THRESHOLD_DAYS}-day threshold; reports "
    "the overrun in days and whole weeks (utils.ts:23-47 diffs)",
    tags=("aggregate", "percentile", "expression"),
    oracle=f"""
WITH lead AS (
    SELECT o.o_orderpriority AS class_of_service,
           percentile_disc(0.85) WITHIN GROUP (ORDER BY
               datediff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE))) AS forecast_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
)
SELECT class_of_service, forecast_days,
       forecast_days - {SLE_TARGET_DAYS} AS overrun_days,
       CAST(floor((forecast_days - {SLE_TARGET_DAYS}) / 7.0) AS BIGINT)
           AS overrun_weeks,
       forecast_days > {SLE_TARGET_DAYS + SLE_THRESHOLD_DAYS} AS breached
FROM lead
""",
)
def threshold_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.metrics import percentile_disc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("class_of_service"),
        F.to_date("o_orderdate").alias("commitment_date"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("departure_date")
    )
    lead = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "lead_days", F.datediff("departure_date", "commitment_date")
        )
        .groupBy("class_of_service")
        .agg(percentile_disc("lead_days", 0.85).alias("forecast_days"))
    )
    overrun = F.col("forecast_days") - SLE_TARGET_DAYS
    return lead.select(
        "class_of_service",
        "forecast_days",
        overrun.alias("overrun_days"),
        F.floor(overrun / 7.0).cast("long").alias("overrun_weeks"),
        (F.col("forecast_days") > SLE_TARGET_DAYS + SLE_THRESHOLD_DAYS).alias(
            "breached"
        ),
    )


# --------------------------------------------------------------------------
# P1 — incremental predicate (cursor + OR-of-ANDs project disjunction)
# --------------------------------------------------------------------------
INCR_CURSOR_TS = "2024-03-01 00:00:00"


@register(
    "incremental_scan",
    doc="P1 incremental predicate: updated > cursor AND an OR-of-ANDs "
    "per-project disjunction AND a resolved-is-null-or-recent guard "
    "(jc_issue.ts:734-776) — all plain Catalyst predicates, fully "
    "pushed to the parquet scan (PushedFilters), zero rows read from "
    "pruned row groups at scale",
    tags=("filter", "pushdown"),
    oracle=f"""
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts > TIMESTAMP '{INCR_CURSOR_TS}'
  AND ((event_type = 'click' AND value > 50)
       OR (event_type = 'view' AND value > 90)
       OR event_type = 'error')
  AND (json_extract(props, '$.k') IS NULL
       OR CAST(json_extract(props, '$.k') AS INT) >= 10)
""",
)
def incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    disjunction = (
        ((F.col("event_type") == "click") & (F.col("value") > 50))
        | ((F.col("event_type") == "view") & (F.col("value") > 90))
        | (F.col("event_type") == "error")
    )
    return ev.filter(
        (F.col("ts") > F.lit(INCR_CURSOR_TS).cast("timestamp"))
        & disjunction
        & (k.isNull() | (k >= 10))
    ).select("event_id", "ts", "user_id", "event_type", "value")


# --------------------------------------------------------------------------
# W11 — last change of day
# --------------------------------------------------------------------------
@register(
    "last_change_of_day",
    doc="W11 last-change-of-day collapse: keep each user's final event "
    "per UTC day (row_number desc over (user, day)) — "
    "process_revision_utils.ts:28-45",
    tags=("window", "dedupe"),
    oracle="""
WITH w AS (
    SELECT user_id, CAST(ts AS DATE) AS day, event_id, ts, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, day, event_id, ts, event_type FROM w WHERE rn = 1
""",
)
def last_change_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("day", F.to_date("ts"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "event_id", "ts", "event_type")
    )


# --------------------------------------------------------------------------
# Metric-layer extension — multi-grain rollup via GROUPING SETS
# --------------------------------------------------------------------------
@register(
    "throughput_rollup_grains",
    doc="Metric-layer extension (SURVEY 2.4 note): departures counted at "
    "three grains at once — (class, month), (class), (month) — via "
    "GROUPING SETS, one scan + one shuffle instead of three jobs; the "
    "gold multi-grain serving table shape",
    tags=("aggregate", "grouping-sets", "gold"),
    oracle="""
SELECT COALESCE(o.o_orderpriority, 'ALL') AS class_of_service,
       COALESCE(strftime(CAST(l.l_shipdate AS DATE), '%Y-%m'), 'ALL')
           AS departure_month,
       COUNT(*) AS n_departures
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY GROUPING SETS ((o.o_orderpriority,
                         strftime(CAST(l.l_shipdate AS DATE), '%Y-%m')),
                        (o.o_orderpriority),
                        (strftime(CAST(l.l_shipdate AS DATE), '%Y-%m')))
""",
)
def throughput_rollup_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.date_format("l_shipdate", "yyyy-MM").alias("mon")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("cls")
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    # DataFrame.groupingSets (Spark 4) instead of a named temp view:
    # a fixed view name is shared session state — two concurrent
    # definitions of this query would race and silently read each
    # other's source
    out = j.groupingSets(
        [[F.col("cls"), F.col("mon")], [F.col("cls")], [F.col("mon")]],
        F.col("cls"),
        F.col("mon"),
    ).agg(F.count(F.lit(1)).alias("n_departures"))
    return out.select(
        F.coalesce(F.col("cls"), F.lit("ALL")).alias("class_of_service"),
        F.coalesce(F.col("mon"), F.lit("ALL")).alias("departure_month"),
        "n_departures",
    )


# --------------------------------------------------------------------------
# A2 — ADO gated revision streams (blocked + custom-field reasons)
# --------------------------------------------------------------------------
_BLOCKED_CASE = """CASE event_type WHEN 'purchase' THEN 'Yes'
                       WHEN 'view' THEN 'No'
                       WHEN 'click' THEN NULL
                       WHEN 'error' THEN 'Blocked: system'
                       ELSE 'No' END"""


@register(
    "ado_blocked_stream",
    doc="A2 ADO blocked-revision stream (revision_utils.ts:3-39): per "
    "user ordered by (ts, event_id), nothing kept before the first "
    "blocking value (non-null, != 'No'); then every value change kept, "
    "flagged = value blocks. operators/revisions.py::blocked_revisions",
    tags=("window", "dedupe", "gate"),
    oracle=f"""
WITH src AS (
    SELECT user_id, event_id, ts, {_BLOCKED_CASE} AS blocked
    FROM events
),
w AS (
    SELECT *, ROW_NUMBER() OVER win AS rn, LAG(blocked) OVER win AS prev
    FROM src
    WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
),
f AS (
    SELECT *, MIN(CASE WHEN blocked IS NOT NULL AND blocked <> 'No'
                       THEN rn END) OVER (PARTITION BY user_id) AS first_rn
    FROM w
)
SELECT user_id, event_id, ts, blocked,
       (blocked IS NOT NULL AND blocked <> 'No') AS flagged
FROM f
WHERE first_rn IS NOT NULL AND rn >= first_rn
  AND (rn = first_rn OR blocked IS DISTINCT FROM prev)
""",
)
def ado_blocked_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.revisions import blocked_revisions

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.expr(_BLOCKED_CASE).alias("blocked")
    )
    return blocked_revisions(
        ev, "blocked", item_col="user_id", order_cols=("ts", "event_id")
    ).select("user_id", "event_id", "ts", "blocked", "flagged")


@register(
    "ado_reason_stream",
    doc="A2 ADO blocked/discarded-reason stream (revision_utils.ts:"
    "112-145): null values neither emit nor reset the comparison "
    "baseline — filter(non-null) THEN dedupe-consecutive. "
    "operators/revisions.py::custom_field_revisions",
    tags=("window", "dedupe"),
    oracle="""
WITH src AS (
    SELECT user_id, event_id, ts,
           CASE event_type WHEN 'error' THEN 'Internal Dependency'
                WHEN 'purchase' THEN 'External Dependency' END AS reason
    FROM events
),
f AS (SELECT * FROM src WHERE reason IS NOT NULL),
w AS (
    SELECT *, LAG(reason) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev
    FROM f
)
SELECT user_id, event_id, ts, reason AS field_value
FROM w WHERE prev IS NULL OR prev <> reason
""",
)
def ado_reason_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.revisions import custom_field_revisions

    # the reason-is-not-null gate custom_field_revisions applies is, on
    # this mapping, exactly event_type IN (error, purchase) — stating it
    # on the SOURCE column turns an unpushable CASE-expression filter
    # into a pushed In() the parquet scan row-group-skips on
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("error", "purchase"))
        .select(
            "user_id",
            "event_id",
            "ts",
            F.when(
                F.col("event_type") == "error", F.lit("Internal Dependency")
            )
            .when(
                F.col("event_type") == "purchase",
                F.lit("External Dependency"),
            )
            .alias("reason"),
        )
    )
    return custom_field_revisions(
        ev, "reason", item_col="user_id", order_cols=("ts", "event_id")
    ).select("user_id", "event_id", "ts", "field_value")


# --------------------------------------------------------------------------
# F15 — demo-data date refresh (update_mock_data_date job)
# --------------------------------------------------------------------------
@register(
    "demo_shift_date_range",
    doc="F15 demo date-range shift (date_update_utils.ts:67-85): each "
    "payload row's (from, until) range moves forward by "
    "(anchor - until) days when positive; rows at/past the anchor are "
    "untouched. operators/demo_refresh.py::shift_date_range",
    tags=("scalar", "demo"),
    oracle="""
WITH p AS (
    SELECT o_custkey,
           MIN(CAST(o_orderdate AS DATE)) AS from_date,
           MAX(CAST(o_orderdate AS DATE)) AS until_date
    FROM orders GROUP BY o_custkey
),
d AS (
    SELECT *, date_diff('day', until_date, DATE '1999-06-07') AS dd FROM p
)
SELECT o_custkey,
       CASE WHEN dd > 0 THEN from_date + CAST(dd AS INTEGER) ELSE from_date END AS from_date,
       CASE WHEN dd > 0 THEN until_date + CAST(dd AS INTEGER) ELSE until_date END AS until_date
FROM d
""",
)
def demo_shift_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.demo_refresh import shift_date_range

    payload = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", F.to_date("o_orderdate").alias("d"))
        .groupBy("o_custkey")
        .agg(F.min("d").alias("from_date"), F.max("d").alias("until_date"))
    )
    return shift_date_range(
        payload,
        ["from_date", "until_date"],
        "until_date",
        F.to_date(F.lit("1999-06-07")),
    )


@register(
    "demo_rebase_stale_weeks",
    doc="F15 weekly-series rebase (date_update_utils.ts:42-64): per "
    "customer, when the latest week differs from the anchor's week the "
    "whole series snaps to the anchor's Monday; current series are "
    "untouched. operators/demo_refresh.py::rebase_stale_weeks",
    tags=("window", "demo"),
    oracle="""
WITH w AS (
    SELECT o_custkey, CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
           COUNT(*) AS n
    FROM orders GROUP BY 1, 2
),
m AS (
    SELECT *, MAX(wk) OVER (PARTITION BY o_custkey) AS latest FROM w
)
SELECT o_custkey,
       CASE WHEN date_trunc('week', latest)
                 <> date_trunc('week', DATE '2001-07-30')
            THEN CAST(date_trunc('week', DATE '2001-07-30') AS DATE)
            ELSE wk END AS wk,
       n
FROM m
""",
)
def demo_rebase_stale_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.demo_refresh import rebase_stale_weeks

    weekly = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.date_trunc("week", "o_orderdate").cast("date").alias("wk"),
        )
        .groupBy("o_custkey", "wk")
        .agg(F.count("*").alias("n"))
    )
    return rebase_stale_weeks(
        weekly, ["o_custkey"], "wk", F.to_date(F.lit("2001-07-30"))
    )


# --------------------------------------------------------------------------
# Scale infrastructure as queries — skew salting (result == unsalted)
# --------------------------------------------------------------------------
@register(
    "salted_join_orders",
    doc="Skew-salted equi-join (operators/skew.py::salted_join): "
    "lineitem (big, salted over 8 sub-keys via deterministic row hash) "
    "joined to per-order dims replicated per salt; result is exactly "
    "the plain join — the oracle IS the unsalted join — while the "
    "shuffle key widens to (o_orderkey, __salt) so one whale order "
    "spreads over 8 reducers",
    tags=("join", "skew", "scale"),
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
       o.o_orderpriority, o.o_orderstatus
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""",
)
def salted_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.skew import salted_join

    big = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"), "l_linenumber", "l_quantity"
    )
    small = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        "o_orderpriority",
        "o_orderstatus",
    )
    return salted_join(big, small, ["l_orderkey"], "inner", salt=8)


@register(
    "salted_distinct_users",
    doc="Two-phase salted aggregation (operators/skew.py::salted_agg) "
    "for a holistic agg: distinct users per event_type — phase 1 "
    "collects per (type, salt), phase 2 merges; equals the plain "
    "COUNT(DISTINCT) while a whale key's rows meet 8 reducers, not 1",
    tags=("aggregate", "skew", "scale"),
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""",
)
def salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return salted_agg(
        ev,
        ["event_type"],
        {"us": F.collect_set("user_id")},
        {
            "n_users": F.size(
                F.array_distinct(F.flatten(F.collect_list("us")))
            ).cast("long")
        },
        salt=8,
    )


# --------------------------------------------------------------------------
# W9 — initial-revision synthesis
# --------------------------------------------------------------------------
@register(
    "initial_revision_synthesis",
    doc="W9 initial-revision synthesis (revision_processor.ts:450-499): "
    "prepend a revision 0 at the item's creation date taking the first "
    "state-change revision's from-status, or the item's own status when "
    "no revisions exist. operators/revisions.py::synthesize_initial_revision",
    tags=("window", "union", "workflow"),
    oracle="""
WITH items AS (
    SELECT 'org1' AS org_id, 'ds1' AS datasource_id,
           CAST(o_orderkey AS VARCHAR) AS work_item_id,
           CAST(o_orderdate AS TIMESTAMP) AS created_date,
           o_orderstatus AS status_id, o_orderstatus AS status_name
    FROM orders
),
revs AS (
    -- the synthetic lineitem repeats (orderkey, linenumber, shipdate)
    -- with different payloads: collapse to one row per key so the
    -- first-revision ordering has no ties (determinism for the gate)
    SELECT CAST(l_orderkey AS VARCHAR) AS work_item_id,
           l_linenumber AS revision,
           CAST(l_shipdate AS TIMESTAMP) AS changed_date,
           'state_change' AS type,
           MAX(l_returnflag) AS status_id, MAX(l_returnflag) AS status_name,
           MAX('Q' || CAST(CAST(l_quantity AS INT) AS VARCHAR)) AS from_status_id,
           MAX('Q' || CAST(CAST(l_quantity AS INT) AS VARCHAR)) AS from_status_name
    FROM lineitem WHERE l_quantity > 10
    GROUP BY 1, 2, 3
),
first_state AS (
    SELECT work_item_id, from_status_id AS first_from_id,
           from_status_name AS first_from_name
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY work_item_id
                                     ORDER BY changed_date, revision) AS rn
        FROM revs
    ) WHERE rn = 1
),
initial AS (
    SELECT i.work_item_id, 0 AS revision, i.created_date AS changed_date,
           'state_change' AS type,
           COALESCE(f.first_from_id, i.status_id) AS status_id,
           COALESCE(f.first_from_name, i.status_name) AS status_name
    FROM items i LEFT JOIN first_state f USING (work_item_id)
)
SELECT work_item_id, revision, changed_date, type, status_id, status_name
FROM revs
UNION ALL
SELECT work_item_id, revision, changed_date, type, status_id, status_name
FROM initial
""",
)
def initial_revision_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.revisions import (
        synthesize_initial_revision,
    )

    items = load_table(spark, sf_dir, "orders").select(
        F.lit("org1").alias("org_id"),
        F.lit("ds1").alias("datasource_id"),
        F.col("o_orderkey").cast("string").alias("work_item_id"),
        F.col("o_orderdate").alias("created_date"),
        F.col("o_orderstatus").alias("status_id"),
        F.col("o_orderstatus").alias("status_name"),
    )
    qual = F.concat(
        F.lit("Q"), F.col("l_quantity").cast("int").cast("string")
    )
    revs = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 10)
        .select(
            F.col("l_orderkey").cast("string").alias("work_item_id"),
            F.col("l_linenumber").alias("revision"),
            F.col("l_shipdate").alias("changed_date"),
            F.col("l_returnflag").alias("rf"),
            qual.alias("qual"),
        )
        # collapse duplicate (item, revision, changed_date) rows: the
        # synthetic data repeats them with different payloads, which
        # would make the first-revision ordering tie nondeterministic
        .groupBy("work_item_id", "revision", "changed_date")
        .agg(F.max("rf").alias("status_id"), F.max("qual").alias("from_status_id"))
        .select(
            "work_item_id",
            "revision",
            "changed_date",
            F.lit("state_change").alias("type"),
            "status_id",
            F.col("status_id").alias("status_name"),
            "from_status_id",
            F.col("from_status_id").alias("from_status_name"),
        )
    )
    out = synthesize_initial_revision(revs, items)
    return out.select(
        "work_item_id", "revision", "changed_date", "type",
        "status_id", "status_name",
    )


# --------------------------------------------------------------------------
# F9-EAV — exploded custom-field serving view (GIN-index analog)
# --------------------------------------------------------------------------
@register(
    "custom_fields_eav",
    doc="EAV materialized view of polymorphic JSON payloads (the "
    "Postgres-GIN-on-JSONB analog, SURVEY §4): parse props to a map, "
    "explode to one (event_id, field, value) row per attribute — the "
    "customFields serving table predicates hit directly instead of "
    "re-parsing JSON per query. from_json + explode, all JVM-side.",
    tags=("json", "explode", "eav"),
    oracle="""
WITH kv AS (
    SELECT event_id, props, UNNEST(json_keys(props)) AS field_name
    FROM events
)
SELECT event_id, field_name,
       json_extract_string(props, '$.' || field_name) AS field_value
FROM kv
""",
)
def custom_fields_eav(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.explode(
            F.from_json(F.col("props"), "map<string,string>")
        ).alias("field_name", "field_value"),
    )
    return parsed


# --------------------------------------------------------------------------
# Jira parent/epic resolution + portfolio rollup
# --------------------------------------------------------------------------
@register(
    "parent_resolution",
    doc="Three-way Jira parent fallback (revision_processor.ts:874-898): "
    "fields.parent.key (cloud parent/sub-task) -> Jira-server Parent "
    "Link field -> epic-link custom field from config, then a "
    "portfolio rollup of child lead time grouped by the resolved "
    "parent (states.parentId feeds portfolio-level lead time). Orders "
    "are work items; the parent candidates are synthesized so the "
    "precedence chain is genuinely exercised (epic link present on "
    "most rows but only wins when the first two are absent). "
    "operators/transform.py::resolve_parent_id — pure column "
    "expressions, one shuffle for the departure agg, one for the "
    "rollup.",
    tags=("parent", "portfolio", "coalesce"),
    oracle="""
WITH it AS (
    SELECT o_orderkey, o_orderdate,
           CASE
               WHEN o_orderkey % 3 = 0
                   THEN 'P-' || CAST(o_custkey % 100 AS VARCHAR)
               WHEN o_orderkey % 3 = 1
                   THEN 'PL-' || CAST(o_custkey % 50 AS VARCHAR)
               WHEN o_orderkey % 5 <> 0
                   THEN 'E-' || CAST(o_custkey % 25 AS VARCHAR)
           END AS parent_id
    FROM orders
),
dep AS (
    SELECT l_orderkey, MAX(l_shipdate) AS departure
    FROM lineitem GROUP BY l_orderkey
),
lt AS (
    SELECT it.parent_id,
           date_diff('day', CAST(it.o_orderdate AS DATE),
                     CAST(dep.departure AS DATE)) AS lead_time_days
    FROM it JOIN dep ON it.o_orderkey = dep.l_orderkey
    WHERE it.parent_id IS NOT NULL
)
SELECT parent_id,
       CAST(COUNT(*) AS BIGINT) AS child_count,
       ROUND(AVG(lead_time_days), 2) AS avg_child_lead_time_days,
       CAST(MAX(lead_time_days) AS INTEGER) AS max_child_lead_time_days
FROM lt
GROUP BY parent_id
""",
)
def parent_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.transform import (
        PARENT_LINK_JIRA_SERVER,
        resolve_parent_id,
    )

    EPIC_LINK_FIELD = "customfield_10008"
    orders = load_table(spark, sf_dir, "orders")
    key, cust = F.col("o_orderkey"), F.col("o_custkey")
    # synthesize the bronze shape: a `parent` struct for cloud items, a
    # raw `fields` map carrying parent-link / epic-link entries. The
    # epic link exists on MOST rows (key % 5 != 0) so precedence — not
    # mere presence — decides the winner for residues 0 and 1.
    items = orders.select(
        key.alias("o_orderkey"),
        F.col("o_orderdate"),
        F.when(
            key % 3 == 0,
            F.struct(
                F.concat(F.lit("P-"), (cust % 100).cast("string")).alias("key")
            ),
        ).alias("parent"),
        F.map_filter(
            F.create_map(
                F.lit(PARENT_LINK_JIRA_SERVER),
                F.when(
                    key % 3 == 1,
                    F.concat(F.lit("PL-"), (cust % 50).cast("string")),
                ),
                F.lit(EPIC_LINK_FIELD),
                F.when(
                    key % 5 != 0,
                    F.concat(F.lit("E-"), (cust % 25).cast("string")),
                ),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("fields"),
    )
    resolved = resolve_parent_id(items, epic_link_field=EPIC_LINK_FIELD)
    departures = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("departure"))
    )
    lead_times = (
        resolved.filter(F.col("parent_id").isNotNull())
        .join(departures, resolved["o_orderkey"] == departures["l_orderkey"])
        .select(
            "parent_id",
            F.datediff(F.col("departure"), F.col("o_orderdate")).alias(
                "lead_time_days"
            ),
        )
    )
    return lead_times.groupBy("parent_id").agg(
        F.count(F.lit(1)).alias("child_count"),
        F.round(F.avg("lead_time_days"), 2).alias("avg_child_lead_time_days"),
        F.max("lead_time_days").alias("max_child_lead_time_days"),
    )


# --------------------------------------------------------------------------
# F11 — generic flagged-field discovery (map HOF scan)
# --------------------------------------------------------------------------
_FLAG_STRUCT = "array<struct<value:string>>"


@register(
    "flag_field_discovery",
    doc="F11 generic flagged-field discovery: scan every item's raw "
    "fields map for array-typed custom fields whose first element's "
    "value is Impediment/Impedimento, electing the field id that "
    "carries the flag (reference jc_issue.ts:820-859 — the fallback "
    "when no flag field is configured). map_filter + explode HOFs: "
    "map-only scan, one tiny per-key aggregate at the end.",
    tags=("parity", "hof", "map"),
    oracle="""
SELECT field_key, flagged_count, first_item_id FROM (
    SELECT 'customfield_10010' AS field_key,
           COUNT(*) AS flagged_count,
           MIN(event_id) AS first_item_id
    FROM events WHERE event_id % 7 IN (0, 1)
    UNION ALL
    SELECT 'customfield_10020' AS field_key,
           COUNT(*) AS flagged_count,
           MIN(event_id) AS first_item_id
    FROM events WHERE event_id % 5 = 0
) hits WHERE flagged_count > 0
""",
)
def flag_field_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.revisions import (
        discover_flag_fields,
    )

    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")

    def arr(val):
        return F.array(F.struct(val.alias("value")))

    # deterministic raw-fields map synthesized from the activity stream:
    # one field that flips between both flag markers, one that is often
    # an EMPTY array (exercises the size() guard), and one non-flag
    # noise field — the polymorphic shape Jira hands back.
    fields = F.map_from_arrays(
        F.array(
            F.lit("customfield_10010"),
            F.lit("customfield_10020"),
            F.lit("labels"),
        ),
        F.array(
            arr(
                F.when(eid % 7 == 0, F.lit("Impediment"))
                .when(eid % 7 == 1, F.lit("Impedimento"))
                .otherwise(F.lit("Normal"))
            ),
            F.when(eid % 5 == 0, arr(F.lit("Impediment"))).otherwise(
                F.array().cast(_FLAG_STRUCT)
            ),
            arr(F.lit("frontend")),
        ),
    )
    items = events.select(
        eid.alias("work_item_id"), fields.alias("fields")
    )
    hits = discover_flag_fields(items, "fields", "work_item_id")
    return hits.groupBy("field_key").agg(
        F.count(F.lit(1)).alias("flagged_count"),
        F.min("work_item_id").alias("first_item_id"),
    )


# --------------------------------------------------------------------------
# F15 — summary-widget rebase (weeks series shift, quarter shift)
# --------------------------------------------------------------------------
_DEMO_ANCHOR = "2024-01-10"  # Wednesday; week start Monday 2024-01-08


@register(
    "demo_summary_weeks_shift",
    doc="F15 summary-widget weekly rebase (updateSummaryWidgetWeeks, "
    "date_update_utils.ts:189-225): shift each key's whole weekly "
    "series so its latest week lands on the anchor week, preserving "
    "spacing; ISO week number + calendar year recomputed from the "
    "shifted week start. One window max per key — no extra shuffle "
    "beyond the grouping.",
    tags=("parity", "date", "window"),
    oracle=f"""
WITH weekly AS (
    SELECT event_type,
           CAST(date_trunc('week', ts) AS DATE) AS week_starting,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
sh AS (
    SELECT *,
           date_diff('day',
               MAX(week_starting) OVER (PARTITION BY event_type),
               date_trunc('week', DATE '{_DEMO_ANCHOR}')) AS dd
    FROM weekly
)
SELECT event_type,
       CAST(week_starting + to_days(dd::INT) AS DATE) AS week_starting,
       CAST(weekofyear(week_starting + to_days(dd::INT)) AS INT) AS week,
       CAST(year(week_starting + to_days(dd::INT)) AS INT) AS year,
       n
FROM sh
""",
)
def demo_summary_weeks_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.demo_refresh import (
        shift_series_weeks,
    )

    events = load_table(spark, sf_dir, "events")
    weekly = events.groupBy(
        "event_type",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_starting"),
    ).agg(F.count(F.lit(1)).alias("n"))
    out = shift_series_weeks(
        weekly,
        ["event_type"],
        "week_starting",
        F.lit(_DEMO_ANCHOR).cast("date"),
    )
    return out.select("event_type", "week_starting", "week", "year", "n")


@register(
    "demo_summary_quarters_shift",
    doc="F15 summary-widget quarter shift (updateSummaryWidgetQuarters, "
    "date_update_utils.ts:242-277): linear quarter delta anchored on "
    "each key's latest entry, exact modular year carry (the reference's "
    "quarter-0 modulo quirk corrected; divergence documented in "
    "operators/demo_refresh.py).",
    tags=("parity", "date", "window"),
    oracle=f"""
WITH q AS (
    SELECT event_type,
           CAST(year(ts) AS INT) AS year,
           CAST(quarter(ts) AS INT) AS quarter,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2, 3
),
sh AS (
    SELECT *,
           (year(DATE '{_DEMO_ANCHOR}') * 4 + quarter(DATE '{_DEMO_ANCHOR}') - 1)
           - MAX(year * 4 + quarter - 1) OVER (PARTITION BY event_type)
               AS qdiff
    FROM q
)
SELECT event_type,
       CAST((year * 4 + quarter - 1 + qdiff) // 4 AS INT) AS year,
       CAST((year * 4 + quarter - 1 + qdiff) % 4 + 1 AS INT) AS quarter,
       n
FROM sh
""",
)
def demo_summary_quarters_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.demo_refresh import shift_quarters

    events = load_table(spark, sf_dir, "events")
    q = events.groupBy(
        "event_type",
        F.year("ts").cast("int").alias("year"),
        F.quarter("ts").cast("int").alias("quarter"),
    ).agg(F.count(F.lit(1)).alias("n"))
    out = shift_quarters(
        q, ["event_type"], "year", "quarter", F.lit(_DEMO_ANCHOR).cast("date")
    )
    return out.select("event_type", "year", "quarter", "n")


# --------------------------------------------------------------------------
# F16 — queue-name sanitize
# --------------------------------------------------------------------------
@register(
    "queue_name_sanitize",
    doc="F16 queue-name sanitize (contexts_queuer.ts:66-78): "
    "'prefix_org_datasource' stripped to [a-zA-Z0-9_] and truncated "
    "to 75 chars — the per-(org,datasource) queue identity the "
    "scheduler derives; pure scalar expression, zero shuffle beyond "
    "the dedupe.",
    tags=("expression", "scalar"),
    oracle="""
SELECT DISTINCT
       substring(regexp_replace(
           'falcon-contexts-extract' || '_' || n_name || '_ds-'
               || CAST(n_nationkey AS VARCHAR),
           '[^a-zA-Z0-9_]', '', 'g'), 1, 75) AS queue_name
FROM nation
""",
)
def queue_name_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.functions.scalar import sanitize_queue_name

    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        sanitize_queue_name(
            F.lit("falcon-contexts-extract"),
            F.col("n_name"),
            F.concat(F.lit("ds-"), F.col("n_nationkey").cast("string")),
        ).alias("queue_name")
    ).dropDuplicates()


# --------------------------------------------------------------------------
# getRevisions — raw changelog -> typed revisions
# --------------------------------------------------------------------------
@register(
    "changelog_parse",
    doc="getRevisions (revision_processor.ts:335-448) end to end: a "
    "nested Jira changelog (histories[].items[]) is assembled per "
    "work item in-plan, then parsed back by "
    "operators/revisions.py::parse_changelog — explode + "
    "when()/otherwise() type tagging, unflag rows (empty to/toString) "
    "emitting flagged=false with statusId 'flagged'. N/A/R line items "
    "play status/assignee/flag entries; every 5th supplier's R rows "
    "are unflags. Pure Catalyst; one explode chain, no shuffle.",
    tags=("workflow", "explode", "json"),
    oracle="""
SELECT CAST(l_orderkey AS VARCHAR) AS work_item_id,
       CAST(l_linenumber * 4
            + CASE l_returnflag WHEN 'N' THEN 1 WHEN 'A' THEN 2 ELSE 3 END
            AS BIGINT) AS revision,
       CAST(l_shipdate AS TIMESTAMP) AS changed_date,
       CASE l_returnflag
            WHEN 'N' THEN 'state_change'
            WHEN 'A' THEN 'assignee_change'
            ELSE 'flagged' END AS type,
       CASE l_returnflag
            WHEN 'N' THEN CAST(l_partkey AS VARCHAR)
            WHEN 'A' THEN 'u' || CAST(l_suppkey AS VARCHAR)
            ELSE CASE WHEN l_suppkey % 5 = 0 THEN 'flagged'
                      ELSE '10019' END END AS status_id,
       CASE l_returnflag
            WHEN 'N' THEN 'S' || CAST(l_partkey AS VARCHAR)
            WHEN 'A' THEN 'User ' || CAST(l_suppkey AS VARCHAR)
            ELSE CASE WHEN l_suppkey % 5 = 0 THEN 'flagged'
                      ELSE 'Impediment' END END AS status_name,
       CASE WHEN l_returnflag = 'A'
            THEN 'User ' || CAST(l_suppkey AS VARCHAR) END AS assignee,
       CASE WHEN l_returnflag = 'R' AND l_suppkey % 5 <> 0 THEN TRUE
            ELSE FALSE END AS flagged
FROM lineitem
""",
)
def changelog_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.revisions import parse_changelog

    li = load_table(spark, sf_dir, "lineitem")
    zone = (
        F.when(F.col("l_returnflag") == "N", 1)
        .when(F.col("l_returnflag") == "A", 2)
        .otherwise(3)
    )
    unflag = (F.col("l_returnflag") == "R") & (F.col("l_suppkey") % 5 == 0)
    entry = F.struct(
        F.when(F.col("l_returnflag") == "N", F.lit("status"))
        .when(F.col("l_returnflag") == "A", F.lit("assignee"))
        .otherwise(F.lit("Flagged"))
        .alias("field"),
        F.lit("f").alias("fieldId"),
        F.lit(None).cast("string").alias("from"),
        F.lit(None).cast("string").alias("fromString"),
        F.when(unflag, F.lit(""))
        .when(F.col("l_returnflag") == "N", F.col("l_partkey").cast("string"))
        .when(
            F.col("l_returnflag") == "A",
            F.concat(F.lit("u"), F.col("l_suppkey").cast("string")),
        )
        .otherwise(F.lit("10019"))
        .alias("to"),
        F.when(unflag, F.lit(""))
        .when(
            F.col("l_returnflag") == "N",
            F.concat(F.lit("S"), F.col("l_partkey").cast("string")),
        )
        .when(
            F.col("l_returnflag") == "A",
            F.concat(F.lit("User "), F.col("l_suppkey").cast("string")),
        )
        .otherwise(F.lit("Impediment"))
        .alias("toString"),
    )
    history = F.struct(
        (F.col("l_linenumber") * 4 + zone).cast("string").alias("id"),
        F.date_format(
            F.col("l_shipdate").cast("timestamp"), "yyyy-MM-dd HH:mm:ss"
        ).alias("created"),
        F.array(entry).alias("items"),
    )
    bronze = (
        li.withColumn("h", history)
        .groupBy("l_orderkey")
        .agg(F.collect_list("h").alias("changelog"))
        .select(
            F.col("l_orderkey").cast("string").alias("work_item_id"),
            "changelog",
        )
    )
    parsed = parse_changelog(bronze)
    return parsed.select(
        "work_item_id",
        "revision",
        "changed_date",
        "type",
        "status_id",
        "status_name",
        "assignee",
        "flagged",
    )
