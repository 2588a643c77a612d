"""Workflow-pipeline queries: the exact event-date extractor (W2) and
custom-field extraction (F9) surfaced as oracle-checked queries.

Mapping (FIXTURES.md section 4): lineitem is the revision stream —
l_orderkey = work item, l_linenumber = revision ordinal, l_shipdate =
changedDate, l_returnflag maps to the workflow zone (N=arrival zone,
A=commitment zone, R=departure zone; points 1/2/3).

The Spark side runs the real grouped-map pandas UDF
(operators/event_dates.extract_event_dates). The oracle re-derives the
same lookahead semantics in pure SQL — valid because this mapping has
no before-arrival steps, so the arrival-reset rule never fires (that
rule is covered by the ported unit suite in tests/test_event_dates.py):

- arrival    = first arrival-zone revision;
- commitment = first commitment-zone revision with NO later same-UTC-day
  return to the arrival zone; the item is delayed iff the LAST revision
  overall is an arrival-zone move on a later day;
- departure  = first departure-zone revision with NO later revision in
  any earlier zone;
- back-fill: arrival := commitment/departure when missing; commitment
  := arrival when departed without commitment; clamp ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.event_dates import extract_event_dates
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.sources import load_table

_EVENT_DATES_FULL_ORACLE = """
WITH revs AS (
    -- revision ordinal folds the zone in: (orderkey, linenumber) is not
    -- unique in the synthetic data, and a (date, revision) tie between
    -- different zones would make "last revision" engine-dependent
    SELECT CAST(l_orderkey AS VARCHAR) AS work_item_id,
           l_linenumber * 4
             + CASE l_returnflag WHEN 'N' THEN 1 WHEN 'A' THEN 2 ELSE 3 END
             AS revision,
           CAST(l_shipdate AS TIMESTAMP) AS changed_date,
           CASE l_returnflag WHEN 'N' THEN 1 WHEN 'A' THEN 2 ELSE 3 END AS zone
    FROM lineitem
),
ordered AS (
    SELECT *,
           CAST(changed_date AS DATE) AS day,
           ROW_NUMBER() OVER w AS rn,
           -- later revisions in zones below departure (for the departure
           -- rule); COALESCE: the frame is empty on the last row
           COALESCE(SUM(CASE WHEN zone < 3 THEN 1 ELSE 0 END) OVER (
               PARTITION BY work_item_id ORDER BY changed_date, revision
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
           ), 0) AS later_low3,
           -- last revision of the item (decides the delayed flag)
           LAST_VALUE(zone) OVER (
               PARTITION BY work_item_id ORDER BY changed_date, revision
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_zone,
           LAST_VALUE(CAST(changed_date AS DATE)) OVER (
               PARTITION BY work_item_id ORDER BY changed_date, revision
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_day,
           LAST_VALUE(revision) OVER (
               PARTITION BY work_item_id ORDER BY changed_date, revision
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_revision
    FROM revs
    WINDOW w AS (PARTITION BY work_item_id ORDER BY changed_date, revision)
),
-- same-day arrival-zone returns after each row (commitment bounce rule)
day_counts AS (
    SELECT *,
           SUM(CASE WHEN zone = 1 THEN 1 ELSE 0 END) OVER (
               PARTITION BY work_item_id, day
           ) AS day_low_total,
           SUM(CASE WHEN zone = 1 THEN 1 ELSE 0 END) OVER (
               PARTITION BY work_item_id, day ORDER BY changed_date, revision
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS day_low_upto
    FROM ordered
),
candidates AS (
    SELECT work_item_id,
           MIN(CASE WHEN zone = 1 THEN changed_date END) AS arrival_raw,
           MIN(CASE WHEN zone = 2 AND (day_low_total - day_low_upto) = 0
                    THEN changed_date END) AS commitment_raw,
           MIN(CASE WHEN zone = 3 AND later_low3 = 0
                    THEN changed_date END) AS departure_raw,
           -- attributes of the chosen commitment candidate
           MIN(CASE WHEN zone = 2 AND (day_low_total - day_low_upto) = 0
                    THEN rn END) AS commitment_rn,
           ANY_VALUE(last_zone) AS last_zone,
           ANY_VALUE(last_day) AS last_day,
           ANY_VALUE(last_revision) AS last_revision
    FROM day_counts
    GROUP BY work_item_id
),
delayed AS (
    SELECT c.*,
           (c.commitment_raw IS NOT NULL
            AND c.last_zone = 1
            AND c.last_day <> CAST(c.commitment_raw AS DATE)
            AND c.last_day > CAST(c.commitment_raw AS DATE)) AS is_delayed_raw
    FROM candidates c
),
filled AS (
    SELECT work_item_id,
           COALESCE(arrival_raw, commitment_raw, departure_raw) AS a1,
           commitment_raw, departure_raw, is_delayed_raw, last_revision
    FROM delayed
),
filled2 AS (
    SELECT work_item_id, a1,
           CASE WHEN commitment_raw IS NULL AND departure_raw IS NOT NULL
                THEN a1 ELSE commitment_raw END AS c1,
           departure_raw, is_delayed_raw, last_revision
    FROM filled
),
clamped AS (
    SELECT work_item_id,
           CASE WHEN departure_raw IS NOT NULL AND c1 > departure_raw
                THEN departure_raw ELSE c1 END AS commitment_date,
           departure_raw AS departure_date, a1, is_delayed_raw, last_revision
    FROM filled2
)
SELECT work_item_id,
       CASE WHEN commitment_date IS NOT NULL AND a1 > commitment_date
            THEN commitment_date ELSE a1 END AS arrival_date,
       commitment_date,
       departure_date,
       COALESCE(is_delayed_raw, FALSE) AS is_delayed,
       CASE WHEN COALESCE(is_delayed_raw, FALSE) THEN last_revision END
           AS delayed_revision
FROM clamped
"""


@register(
    "event_dates_full",
    doc="W2 exact event-date extraction (applyInPandas, same-day bounce + "
    "delayed + departure lookahead + invariant back-fill) vs a pure-SQL "
    "re-derivation as oracle; reference semantics "
    "src/configuration/event_date_extractor.ts:117-368",
    tags=("workflow", "pandas-udf", "window"),
    oracle=_EVENT_DATES_FULL_ORACLE,
)
def event_dates_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    tagged = lineitem.select(
        F.col("l_orderkey").cast("string").alias("work_item_id"),
        (
            F.col("l_linenumber") * 4
            + F.when(F.col("l_returnflag") == "N", 1)
            .when(F.col("l_returnflag") == "A", 2)
            .otherwise(3)
        ).alias("revision"),
        F.col("l_shipdate").alias("changed_date"),
        F.when(F.col("l_returnflag") == "N", 1)
        .when(F.col("l_returnflag") == "A", 2)
        .otherwise(3)
        .alias("zone"),
    )
    return extract_event_dates(tagged)


@register(
    "event_dates_expr",
    doc="W2 exact event dates as pure Catalyst window expressions (the "
    "scale path — no Python in the plan; fuzz-verified equivalent to the "
    "pandas UDF) against the same SQL oracle",
    tags=("workflow", "window"),
    oracle=_EVENT_DATES_FULL_ORACLE,
)
def event_dates_expr_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.event_dates import (
        extract_event_dates_expr,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    tagged = lineitem.select(
        F.col("l_orderkey").cast("string").alias("work_item_id"),
        (
            F.col("l_linenumber") * 4
            + F.when(F.col("l_returnflag") == "N", 1)
            .when(F.col("l_returnflag") == "A", 2)
            .otherwise(3)
        ).alias("revision"),
        F.col("l_shipdate").alias("changed_date"),
        F.when(F.col("l_returnflag") == "N", 1)
        .when(F.col("l_returnflag") == "A", 2)
        .otherwise(3)
        .alias("zone"),
    )
    return extract_event_dates_expr(tagged)


@register(
    "event_dates_routed",
    doc="W2 with the whale-history split active: per-item revision "
    "counts decide (exactly, one column-pruned aggregate job) whether "
    "an item takes the codegen expr path or the mapInPandas "
    "extractor; the branches union. Same oracle as event_dates_expr — "
    "the split is semantics-neutral by construction (oracle-verified "
    "here). On uniform data no item crosses the threshold and the "
    "plan degenerates to the expr path. NOTE: the r6 skew probe "
    "measured whale->pandas routing as a net LOSS (27x vs the expr "
    "path's 1.46x under a 300k-revision hot item), so "
    "transform_work_items defaults the routing OFF; this registration "
    "verifies the mechanism's correctness, not a perf claim (SCALE.md). "
    "Bench-tagged OUT of HEADLINE in r14 (r13 verdict #7): a "
    "documented-net-loss mechanism witness whose two-path union read "
    "4.8x under driver-session contention and distorted the headline "
    "total; it stays registered and oracled here.",
    tags=("workflow", "window", "pandas-udf"),
    oracle=_EVENT_DATES_FULL_ORACLE,
)
def event_dates_routed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.event_dates import (
        extract_event_dates_routed,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    tagged = lineitem.select(
        F.col("l_orderkey").cast("string").alias("work_item_id"),
        (
            F.col("l_linenumber") * 4
            + F.when(F.col("l_returnflag") == "N", 1)
            .when(F.col("l_returnflag") == "A", 2)
            .otherwise(3)
        ).alias("revision"),
        F.col("l_shipdate").alias("changed_date"),
        F.when(F.col("l_returnflag") == "N", 1)
        .when(F.col("l_returnflag") == "A", 2)
        .otherwise(3)
        .alias("zone"),
    )
    return extract_event_dates_routed(tagged)


@register(
    "custom_field_extraction",
    doc="F9 polymorphic custom-field extraction (Arrow-batched pandas UDF "
    "over raw JSON; reference translate_customfield.ts:3-116) — scalar "
    "payload case checked against DuckDB json_extract",
    tags=("pandas-udf", "json"),
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS field_value
FROM events
""",
)
def custom_field_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.functions.custom_fields import (
        extract_custom_field_values,
    )

    events = load_table(spark, sf_dir, "events")
    values = extract_custom_field_values(
        F.get_json_object(F.col("props"), "$.k")
    )
    return events.select(
        "event_id", F.element_at(values, 1).alias("field_value")
    )


@register(
    "snapshot_derivation",
    doc="W5/W6/W8 snapshot derivation end-to-end: tagged revisions + "
    "expression event dates -> per-revision as-of state category, step "
    "category, and is-delayed — the silver `snapshots` shape "
    "(derive_snapshots; reference revision_processor.ts:671-830, "
    "date_utils.ts:67-95). One shuffle on work_item_id, reused by the "
    "event-date window and the join.",
    tags=("workflow", "window", "join"),
    oracle=f"""
WITH ed AS ({_EVENT_DATES_FULL_ORACLE}),
revs AS (
    SELECT CAST(l_orderkey AS VARCHAR) AS work_item_id,
           l_linenumber * 4
             + CASE l_returnflag WHEN 'N' THEN 1 WHEN 'A' THEN 2 ELSE 3 END
             AS revision,
           CAST(l_shipdate AS TIMESTAMP) AS changed_date,
           CASE l_returnflag WHEN 'N' THEN 1 WHEN 'A' THEN 2 ELSE 3 END AS zone
    FROM lineitem
)
SELECT r.work_item_id, r.revision,
       CAST(r.changed_date AS DATE) AS snapshot_date,
       CASE r.zone WHEN 0 THEN 'preceding' WHEN 1 THEN 'proposed'
            WHEN 2 THEN 'inprogress' ELSE 'completed' END AS step_category,
       CASE WHEN ed.arrival_date IS NULL
                 OR r.changed_date < ed.arrival_date THEN 'preceding'
            WHEN ed.commitment_date IS NULL
                 OR r.changed_date < ed.commitment_date THEN 'proposed'
            WHEN ed.departure_date IS NULL
                 OR r.changed_date < ed.departure_date THEN 'inprogress'
            ELSE 'completed' END AS state_category,
       (ed.delayed_revision IS NOT NULL
        AND r.revision >= ed.delayed_revision) AS is_delayed,
       FALSE AS flagged
FROM revs r JOIN ed ON ed.work_item_id = r.work_item_id
""",
)
def snapshot_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.event_dates import (
        extract_event_dates_expr,
    )
    from falcon_metrics_etl_spark.operators.snapshots import derive_snapshots

    lineitem = load_table(spark, sf_dir, "lineitem")
    tagged = lineitem.select(
        F.col("l_orderkey").cast("string").alias("work_item_id"),
        (
            F.col("l_linenumber") * 4
            + F.when(F.col("l_returnflag") == "N", 1)
            .when(F.col("l_returnflag") == "A", 2)
            .otherwise(3)
        ).alias("revision"),
        F.col("l_shipdate").alias("changed_date"),
        F.when(F.col("l_returnflag") == "N", 1)
        .when(F.col("l_returnflag") == "A", 2)
        .otherwise(3)
        .alias("zone"),
        F.lit("state_change").alias("type"),
        F.lit(False).alias("flagged"),
    )
    event_dates = extract_event_dates_expr(tagged)
    snaps = derive_snapshots(tagged, event_dates)
    return snaps.select(
        "work_item_id",
        "revision",
        "snapshot_date",
        "step_category",
        "state_category",
        "is_delayed",
        "flagged",
    )
