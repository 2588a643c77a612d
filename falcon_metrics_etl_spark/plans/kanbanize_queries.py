"""Kanbanize card->state/snapshot scenarios as oracle-checked queries
(S5/P6/W10 end to end — reference
/root/reference/src/kanbanize/transform_processor.ts:385-493).

Synthetic mapping (FIXTURES.md style): orders are Kanbanize cards,
lineitem rows are their raw transitions, and a fixed 3-column board
workflow (Backlog -> In Progress -> Done) with point orders (1,2,3)
plays the workflow config:

- card_id = o_orderkey; board_id = o_custkey % 3 (3 boards, one
  'Delivery Flow' workflow each, keyed by the slugified
  `org.board.workflow_name`);
- card type = o_orderkey % 5; the workItemTypeMaps dim configures only
  types 0-3, so every type-4 card exercises the isConfiguredCardType
  skip (ts:385-400, 461-464);
- the card's CURRENT column is 1 + o_orderkey % 3 (a card property in
  Kanbanize, independent of its history — exactly how the reference
  treats card.column_id);
- raw transitions: l_shipdate is the transition start, l_returnflag
  maps N/A/R -> columns 1/2/3, and the array index `idx` is the
  (start, linenumber) rank — compression keeps only column-changing
  rows and stamps each with its original index as `revision`
  (getStateTransitions ts:293-312);
- event dates run on the COMPRESSED history (getHistoryItems
  ts:314-326) with the full W2 lookahead semantics;
- custom fields: two synthetic fields per card; the second has no
  display value for every 4th card, so transformCustomFields
  (ts:495-511) drops it.

Both queries run the real operators
(falcon_metrics_etl_spark/operators/kanbanize.py); the oracles
re-derive the whole pipeline in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.kanbanize import transform_cards
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.sources import load_table

_ORG = "kb-org"


def _build_inputs(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    col_name = (
        F.when(F.col("column_id") == 1, "Backlog")
        .when(F.col("column_id") == 2, "In Progress")
        .otherwise("Done")
    )
    cards = orders.select(
        F.col("o_orderkey").alias("card_id"),
        (F.col("o_custkey") % 3).cast("string").alias("board_id"),
        F.lit("Delivery Flow").alias("workflow_name"),
        (1 + F.col("o_orderkey") % 3).alias("column_id"),
        (F.col("o_orderkey") % 5).alias("type_id"),
        F.concat(F.lit("Type "), (F.col("o_orderkey") % 5)).alias("type_name"),
        F.col("o_orderstatus").alias("title"),
        F.col("o_orderstatus").alias("owner_user_name"),
        F.col("o_orderdate").cast("timestamp").alias("last_modified"),
        F.array(
            F.struct(
                F.lit(101).alias("field_id"),
                F.lit("Priority").alias("field_name"),
                F.col("o_orderpriority").alias("display_value"),
            ),
            F.struct(
                F.lit(102).alias("field_id"),
                F.lit("Comment").alias("field_name"),
                F.when(F.col("o_orderkey") % 4 != 0, F.col("o_orderpriority")).alias(
                    "display_value"
                ),
            ),
        ).alias("custom_fields"),
    ).withColumn("column_name", col_name)

    from pyspark.sql import Window

    # (l_shipdate, l_linenumber) is NOT unique in the synthetic data —
    # returnflag+partkey complete a deterministic total order shared
    # with the oracle (any residual tie has an identical column_id, so
    # compression output is unaffected)
    idx_w = Window.partitionBy("l_orderkey").orderBy(
        "l_shipdate", "l_linenumber", "l_returnflag", "l_partkey"
    )
    transitions = lineitem.select(
        F.col("l_orderkey").alias("card_id"),
        F.col("l_shipdate").cast("timestamp").alias("start"),
        F.when(F.col("l_returnflag") == "N", 1)
        .when(F.col("l_returnflag") == "A", 2)
        .otherwise(3)
        .alias("column_id"),
        (F.row_number().over(idx_w) - 1).alias("idx"),
    ).withColumn("column_name", col_name)

    # config dims as literal frames (in production these come from the
    # wizard config tables with STORED workflow keys; the engine-side
    # slugify runs on the CARDS in transform_cards — the parity point).
    # Built in Python so the plan carries no dim-construction crossJoin.
    slugs = [f"{_ORG}.{b}.delivery-flow" for b in range(3)]
    steps_literal = [
        ("1", "Backlog", 1, "queue"),
        ("2", "In Progress", 2, "active"),
        ("3", "Done", 3, "queue"),
    ]
    workflow_steps = spark.createDataFrame(
        [(s, *step) for s in slugs for step in steps_literal],
        "workflow_id string, step_id string, step_name string, "
        "step_order int, state_type string",
    )
    workflow_events = spark.createDataFrame(
        [(s, 1, 2, 3) for s in slugs],
        "workflow_id string, arrival_point_order int, "
        "commitment_point_order int, departure_point_order int",
    )
    type_maps = spark.createDataFrame(
        [(str(t), str(b), f"wit-{t}", 5 + t) for b in range(3) for t in range(4)],
        "datasource_work_item_id string, project_id string, "
        "work_item_type_id string, service_level_expectation_in_days int",
    )
    work_item_types = spark.createDataFrame(
        [(f"wit-{t}", f"Type {t}", "Team") for t in range(4)],
        "id string, display_name string, level string",
    )
    return cards, transitions, workflow_steps, workflow_events, type_maps, work_item_types


# Shared oracle CTE chain: cards -> configured filter -> transition
# compression -> exact W2 event dates over the compressed history.
# (Zones here are 1/2/3 — there is no before-arrival column, so the
# arrival-reset rule cannot fire; it is covered by the ported unit
# suite in tests/test_event_dates.py.)
_KB_CTES = """
WITH cards AS (
    SELECT o_orderkey AS card_id,
           CAST(o_custkey % 3 AS VARCHAR) AS board_id,
           o_orderkey % 5 AS type_id,
           1 + o_orderkey % 3 AS cur_col,
           CAST(o_orderdate AS TIMESTAMP) AS last_modified,
           o_orderstatus,
           o_orderkey % 4 = 0 AS comment_missing
    FROM orders
),
cfg AS (SELECT * FROM cards WHERE type_id <= 3),
raw AS (
    SELECT l_orderkey AS card_id,
           CAST(l_shipdate AS TIMESTAMP) AS ts,
           CASE l_returnflag WHEN 'N' THEN 1 WHEN 'A' THEN 2 ELSE 3 END
               AS col_id,
           ROW_NUMBER() OVER (PARTITION BY l_orderkey
                              ORDER BY l_shipdate, l_linenumber,
                                       l_returnflag, l_partkey) - 1 AS idx
    FROM lineitem
    WHERE l_orderkey IN (SELECT card_id FROM cfg)
),
comp AS (
    SELECT card_id, ts, col_id, idx AS revision FROM (
        SELECT *, LAG(col_id) OVER (PARTITION BY card_id ORDER BY idx)
                   AS prev_col
        FROM raw
    ) WHERE prev_col IS NULL OR prev_col <> col_id
),
ordered AS (
    SELECT card_id, ts, revision, col_id AS zone,
           CAST(ts AS DATE) AS day,
           COALESCE(SUM(CASE WHEN col_id < 3 THEN 1 ELSE 0 END) OVER (
               PARTITION BY card_id ORDER BY ts, revision
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
           ), 0) AS later_low3,
           LAST_VALUE(col_id) OVER (
               PARTITION BY card_id ORDER BY ts, revision
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_zone,
           LAST_VALUE(CAST(ts AS DATE)) OVER (
               PARTITION BY card_id ORDER BY ts, revision
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_day,
           LAST_VALUE(revision) OVER (
               PARTITION BY card_id ORDER BY ts, revision
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_revision
    FROM comp
),
day_counts AS (
    SELECT *,
           SUM(CASE WHEN zone = 1 THEN 1 ELSE 0 END) OVER (
               PARTITION BY card_id, day
           ) AS day_low_total,
           SUM(CASE WHEN zone = 1 THEN 1 ELSE 0 END) OVER (
               PARTITION BY card_id, day ORDER BY ts, revision
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS day_low_upto
    FROM ordered
),
candidates AS (
    SELECT card_id,
           MIN(CASE WHEN zone = 1 THEN ts END) AS arrival_raw,
           MIN(CASE WHEN zone = 2 AND (day_low_total - day_low_upto) = 0
                    THEN ts END) AS commitment_raw,
           MIN(CASE WHEN zone = 3 AND later_low3 = 0 THEN ts END)
               AS departure_raw,
           ANY_VALUE(last_zone) AS last_zone,
           ANY_VALUE(last_day) AS last_day,
           ANY_VALUE(last_revision) AS last_revision
    FROM day_counts
    GROUP BY card_id
),
delayed AS (
    SELECT c.*,
           (c.commitment_raw IS NOT NULL AND c.last_zone = 1
            AND c.last_day <> CAST(c.commitment_raw AS DATE)) AS is_delayed_raw
    FROM candidates c
),
filled AS (
    SELECT card_id,
           COALESCE(arrival_raw, commitment_raw, departure_raw) AS a1,
           commitment_raw, departure_raw, is_delayed_raw, last_revision
    FROM delayed
),
filled2 AS (
    SELECT card_id, a1,
           CASE WHEN commitment_raw IS NULL AND departure_raw IS NOT NULL
                THEN a1 ELSE commitment_raw END AS c1,
           departure_raw, is_delayed_raw, last_revision
    FROM filled
),
ed AS (
    SELECT card_id,
           CASE WHEN c2 IS NOT NULL AND a1 > c2 THEN c2 ELSE a1 END
               AS arrival_date,
           c2 AS commitment_date,
           departure_raw AS departure_date,
           COALESCE(is_delayed_raw, FALSE) AS is_delayed,
           CASE WHEN COALESCE(is_delayed_raw, FALSE) THEN last_revision END
               AS delayed_revision
    FROM (
        SELECT *,
               CASE WHEN departure_raw IS NOT NULL AND c1 > departure_raw
                    THEN departure_raw ELSE c1 END AS c2
        FROM filled2
    )
)
"""


@register(
    "kanbanize_card_states",
    doc="S5/P6 Kanbanize card -> StandardStateItem end to end: slugified "
    "workflow key, type-map skip (types 4 dropped), current column -> "
    "step match on id AND name, exact event dates over the compressed "
    "transition history, state/step category, type dims, custom-field "
    "translation (count surfaced). Reference "
    "transform_processor.ts:93-207, 385-493.",
    tags=("kanbanize", "workflow", "window", "join"),
    oracle=_KB_CTES
    + """
SELECT CAST(c.card_id AS VARCHAR) AS work_item_id,
       c.board_id AS project_id,
       'kb-org.' || c.board_id || '.delivery-flow' AS workflow_id,
       CASE c.cur_col WHEN 1 THEN 'Backlog' WHEN 2 THEN 'In Progress'
            ELSE 'Done' END AS state,
       CAST(c.cur_col AS VARCHAR) AS state_order,
       CASE c.cur_col WHEN 2 THEN 'active' ELSE 'queue' END AS state_type,
       CASE WHEN e.departure_date IS NOT NULL THEN 'completed'
            WHEN e.commitment_date IS NOT NULL THEN 'inprogress'
            WHEN e.arrival_date IS NOT NULL THEN 'proposed'
            ELSE 'preceding' END AS state_category,
       CASE WHEN c.cur_col < 2 THEN 'proposed'
            WHEN c.cur_col < 3 THEN 'inprogress'
            ELSE 'completed' END AS step_category,
       e.arrival_date, e.commitment_date, e.departure_date,
       COALESCE(e.is_delayed, FALSE) AS is_delayed,
       'Type ' || CAST(c.type_id AS VARCHAR) AS work_item_type,
       'wit-' || CAST(c.type_id AS VARCHAR) AS flomatika_work_item_type_id,
       'Type ' || CAST(c.type_id AS VARCHAR)
           AS flomatika_work_item_type_name,
       'Team' AS flomatika_work_item_type_level,
       5 + c.type_id AS flomatika_type_sle_days,
       c.o_orderstatus AS assigned_to,
       c.last_modified AS changed_date,
       CASE WHEN c.comment_missing THEN 1 ELSE 2 END AS n_custom_fields
FROM cfg c LEFT JOIN ed e ON e.card_id = c.card_id
""",
)
def kanbanize_card_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    cards, transitions, steps, events, maps, wits = _build_inputs(spark, sf_dir)
    states, _ = transform_cards(
        cards, transitions, steps, events, maps, wits, _ORG
    )
    return _states_projection(states)


def _states_projection(states: DataFrame) -> DataFrame:
    """The StandardStateItem projection the oracle checks — shared
    with bench.py's bucketed-layout stage so both time the identical
    output shape."""
    return states.select(
        "work_item_id",
        "project_id",
        "workflow_id",
        "state",
        "state_order",
        "state_type",
        "state_category",
        "step_category",
        "arrival_date",
        "commitment_date",
        "departure_date",
        "is_delayed",
        "work_item_type",
        "flomatika_work_item_type_id",
        "flomatika_work_item_type_name",
        "flomatika_work_item_type_level",
        "flomatika_type_sle_days",
        "assigned_to",
        "changed_date",
        F.coalesce(F.size("custom_fields"), F.lit(0)).alias("n_custom_fields"),
    )


@register(
    "kanbanize_card_snapshots",
    doc="W10 + transformTransitions end to end: compressed transitions "
    "(revision = original array index) -> per-snapshot step category "
    "(calculateStepCategory vs effective point orders), as-of state "
    "category (stateCategoryRelativeToDate), and isDelayed. Reference "
    "transform_processor.ts:209-312.",
    tags=("kanbanize", "workflow", "window"),
    oracle=_KB_CTES
    + """
SELECT CAST(o.card_id AS VARCHAR) AS work_item_id,
       o.revision,
       'state_change' AS type,
       o.ts AS changed_date,
       CAST(o.ts AS DATE) AS snapshot_date,
       CASE o.zone WHEN 1 THEN 'Backlog' WHEN 2 THEN 'In Progress'
            ELSE 'Done' END AS state,
       CAST(o.zone AS VARCHAR) AS state_order,
       CASE o.zone WHEN 2 THEN 'active' ELSE 'queue' END AS state_type,
       CASE o.zone WHEN 1 THEN 'proposed' WHEN 2 THEN 'inprogress'
            ELSE 'completed' END AS step_category,
       CASE WHEN e.arrival_date IS NULL OR o.ts < e.arrival_date
                THEN 'preceding'
            WHEN e.commitment_date IS NULL OR o.ts < e.commitment_date
                THEN 'proposed'
            WHEN e.departure_date IS NULL OR o.ts < e.departure_date
                THEN 'inprogress'
            ELSE 'completed' END AS state_category,
       (e.delayed_revision IS NOT NULL AND o.revision >= e.delayed_revision)
           AS is_delayed,
       FALSE AS is_filler
FROM ordered o JOIN ed e ON e.card_id = o.card_id
""",
)
def kanbanize_card_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    cards, transitions, steps, events, maps, wits = _build_inputs(spark, sf_dir)
    _, snapshots = transform_cards(
        cards, transitions, steps, events, maps, wits, _ORG
    )
    return snapshots
