"""Sprint ETL — SURVEY.md J9/A10 (the Jira sprints pipeline).

Behavioral reference (re-expressed, not translated):
/root/reference/src/jiracloud/process/extract_sprints_processor.ts

- extract (ts:472-495): contexts with a valid address -> boards per
  context (scrum boards only, ts:281-307) -> sprints per board;
- transform (ts:500-533) + transformSprint (ts:261-278): flatten the
  two maps into FlomatikaSprint rows (orgId, datasourceId, sprintId,
  name, startDate, endDate) — one row per (context, board, sprint)
  path, duplicates included;
- the sprint-to-work-item mapping queue dedupes by
  ``_.uniqBy([orgId, datasourceId, sprintId].join('#'))`` which keeps
  the FIRST occurrence in iteration order (ts:431-433);
- loadSprintWorkItemMap (ts:601-610) upserts bridge rows on the
  4-column PK (orgId, datasourceId, sprintId, workItemId)
  (sql/full_ddl.sql:1257-1269) — idempotent MERGE semantics, i.e.
  distinct pairs.

Scale notes: contexts/boards are tiny config dims (broadcast); the
sprint stream and the bridge join shuffle only on sprint_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def valid_contexts(contexts: DataFrame, address_col: str = "context_address") -> DataFrame:
    """P5 — keep contexts whose address parses as an integer
    (extract_state_processor.ts:101-117; the sprints extract applies
    the same contextAddress presence/validity gate, ts:476-479)."""
    return contexts.filter(F.col(address_col).try_cast("int").isNotNull())


def flatten_sprints(
    context_boards: DataFrame,
    board_sprints: DataFrame,
    org_id: str,
    datasource_id: str,
) -> DataFrame:
    """transform (ts:500-533): one FlomatikaSprint row per
    (context, board, sprint) path — duplicates when a board belongs to
    several contexts, exactly like the reference's nested loops.

    context_boards: context_id, ctx_order, board_id (scrum boards
    already filtered, ts:287). board_sprints: board_id, sprint_id,
    sprint_name, start_date, end_date.
    """
    return (
        context_boards.join(board_sprints, "board_id")
        .select(
            F.lit(org_id).alias("org_id"),
            F.lit(datasource_id).alias("datasource_id"),
            F.col("sprint_id").cast("string").alias("sprint_id"),
            "sprint_name",
            "start_date",
            "end_date",
            "context_id",
            "ctx_order",
            "board_id",
        )
    )


def dedupe_sprints_first(flat: DataFrame, order_cols: tuple = ("ctx_order", "board_id")) -> DataFrame:
    """A10 — ``_.uniqBy(org#ds#sprintId)`` keeps the FIRST occurrence
    in iteration order (ts:431-433). Iteration order is contexts, then
    boards within a context — callers pass the matching order columns.
    One window shuffle keyed on the sprint PK."""
    w = Window.partitionBy("org_id", "datasource_id", "sprint_id").orderBy(
        *order_cols
    )
    return (
        flat.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def sprint_work_item_bridge(
    sprints: DataFrame, memberships: DataFrame
) -> DataFrame:
    """J9 — bridge rows keyed (orgId, datasourceId, sprintId,
    workItemId); the per-row upsert (sprint_load_processor_aurora.ts:
    60-80) is a keyed MERGE, i.e. distinct pairs.

    memberships: sprint_id, work_item_id (the issues-in-sprint fetch,
    ts:565-599).
    """
    pairs = sprints.join(
        memberships.select(
            F.col("sprint_id").cast("string").alias("sprint_id"),
            F.col("work_item_id").cast("string").alias("work_item_id"),
        ),
        "sprint_id",
    )
    return pairs.dropDuplicates(
        ["org_id", "datasource_id", "sprint_id", "work_item_id"]
    )
