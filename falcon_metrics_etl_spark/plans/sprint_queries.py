"""Sprint ETL parity as an oracle-checked query (J9/A10/P5 — reference
/root/reference/src/jiracloud/process/extract_sprints_processor.ts).

Synthetic mapping: region rows are contexts (region 4's address does
not parse as an int, so the P5 validity gate drops it), nation rows
are boards (even nationkey = scrum — the reference keeps scrum boards
only), customer rows are sprints on their nation's board, and orders
are the issues-in-sprint membership (an order belongs to its
customer's sprint). A synthetic 'portfolio' context (id 9) contains
EVERY scrum board, so each sprint reaches the flat list through two
contexts and exercises the first-occurrence ``_.uniqBy`` dedupe
(ts:431-433): sprints keep their region context (lower ctx_order);
boards whose region context was dropped by the address gate surface
through the portfolio context only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.sprints import (
    dedupe_sprints_first,
    flatten_sprints,
    sprint_work_item_bridge,
    valid_contexts,
)
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.sources import load_table

_ORG = "jira-org"
_DS = "ds-1"


@register(
    "sprint_bridge",
    doc="J9 sprint ETL end to end: context address gate (P5) -> scrum "
    "boards per context -> sprints per board -> flatten "
    "(transform ts:500-533) -> first-occurrence uniqBy dedupe on "
    "(org, datasource, sprintId) (ts:431-433, A10) -> issues-in-sprint "
    "bridge rows on the 4-column PK (sprint_load_processor_aurora.ts:"
    "60-80, DDL sprintWorkItemMaps 1257-1269). Dims broadcast; the "
    "only wide shuffles key on sprint_id.",
    tags=("sprints", "join", "dedupe", "window"),
    oracle="""
WITH contexts AS (
    SELECT CAST(r_regionkey AS VARCHAR) AS context_id,
           r_regionkey AS ctx_order,
           CASE WHEN r_regionkey < 4 THEN CAST(r_regionkey AS VARCHAR)
                ELSE 'n/a' END AS context_address
    FROM region
    UNION ALL
    SELECT '9', 9, '9'
),
valid AS (
    SELECT * FROM contexts WHERE TRY_CAST(context_address AS INTEGER) IS NOT NULL
),
boards AS (
    SELECT n_nationkey AS board_id, n_regionkey AS region_key
    FROM nation WHERE n_nationkey % 2 = 0
),
ctx_boards AS (
    SELECT v.context_id, v.ctx_order, b.board_id
    FROM valid v JOIN boards b ON b.region_key = CAST(v.context_id AS INTEGER)
    WHERE v.context_id <> '9'
    UNION ALL
    SELECT v.context_id, v.ctx_order, b.board_id
    FROM valid v CROSS JOIN boards b WHERE v.context_id = '9'
),
sprints AS (
    SELECT c_custkey AS sprint_id, c_nationkey AS board_id,
           c_name AS sprint_name,
           DATE '1994-01-01' + CAST(c_custkey % 365 AS INTEGER) AS start_date,
           DATE '1994-01-01' + CAST(c_custkey % 365 AS INTEGER) + 14 AS end_date
    FROM customer
),
flat AS (
    SELECT 'jira-org' AS org_id, 'ds-1' AS datasource_id,
           CAST(s.sprint_id AS VARCHAR) AS sprint_id,
           s.sprint_name, s.start_date, s.end_date,
           cb.context_id, cb.ctx_order, cb.board_id
    FROM ctx_boards cb JOIN sprints s ON s.board_id = cb.board_id
),
dedup AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY org_id, datasource_id, sprint_id
            ORDER BY ctx_order, board_id) AS rn
        FROM flat
    ) WHERE rn = 1
)
SELECT d.org_id, d.datasource_id, d.sprint_id,
       CAST(o.o_orderkey AS VARCHAR) AS work_item_id,
       d.sprint_name, d.start_date, d.end_date, d.context_id
FROM dedup d JOIN orders o ON CAST(o.o_custkey AS VARCHAR) = d.sprint_id
""",
)
def sprint_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    contexts = region.select(
        F.col("r_regionkey").cast("string").alias("context_id"),
        F.col("r_regionkey").cast("int").alias("ctx_order"),
        F.when(
            F.col("r_regionkey") < 4, F.col("r_regionkey").cast("string")
        )
        .otherwise(F.lit("n/a"))
        .alias("context_address"),
    ).unionByName(
        spark.createDataFrame(
            [("9", 9, "9")],
            "context_id string, ctx_order int, context_address string",
        )
    )
    valid = valid_contexts(contexts)

    boards = nation.filter(F.col("n_nationkey") % 2 == 0).select(
        F.col("n_nationkey").alias("board_id"),
        F.col("n_regionkey").alias("region_key"),
    )
    regional = valid.filter(F.col("context_id") != "9").join(
        boards,
        boards.region_key == F.col("context_id").cast("int"),
    )
    # portfolio context contains EVERY scrum board; its inclusion is
    # gated on surviving the address-validity filter. The 0-or-1-row
    # gate against the <=25-row scrum-board dim is a deliberate
    # broadcast nested-loop (any constant-key equi-join constant-folds
    # to the same plan) — whitelisted in plan_audit with this reason.
    portfolio = valid.filter(F.col("context_id") == "9").crossJoin(boards)
    ctx_boards = regional.unionByName(portfolio).select(
        "context_id", "ctx_order", "board_id"
    )

    sprints = customer.select(
        F.col("c_custkey").alias("sprint_id"),
        F.col("c_nationkey").alias("board_id"),
        F.col("c_name").alias("sprint_name"),
        F.date_add(
            F.lit("1994-01-01").cast("date"),
            (F.col("c_custkey") % 365).cast("int"),
        ).alias("start_date"),
        F.date_add(
            F.lit("1994-01-01").cast("date"),
            (F.col("c_custkey") % 365).cast("int") + 14,
        ).alias("end_date"),
    )

    flat = flatten_sprints(ctx_boards, sprints, _ORG, _DS)
    deduped = dedupe_sprints_first(flat)
    memberships = orders.select(
        F.col("o_custkey").alias("sprint_id"),
        F.col("o_orderkey").alias("work_item_id"),
    )
    bridge = sprint_work_item_bridge(deduped, memberships)
    return bridge.select(
        "org_id",
        "datasource_id",
        "sprint_id",
        "work_item_id",
        "sprint_name",
        "start_date",
        "end_date",
        "context_id",
    )
