"""Incremental cursor control table — SURVEY.md ST1 / A8.

The reference keeps one cursor per datasource
(``datasources.nextRunStartFrom``, sql/full_ddl.sql:333-346), reads it
before each run (src/jiracloud/data/jc_issue.ts:467-472) and advances
it to max(updated) of the processed items, guarded against moving
backwards (src/jiracloud/process/extract_state_processor.ts:444-446,
492-497). The engine keeps the same thing as a tiny parquet control
table keyed (org_id, datasource_id) — read once per batch (driver-side,
2 columns, broadcast-sized by construction).
"""

from __future__ import annotations

from datetime import datetime
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.sinks.merge import _target_exists, merge_upsert

CURSOR_KEYS = ("org_id", "datasource_id")
_SCHEMA = "org_id string, datasource_id string, next_run_start_from timestamp"


def load_cursor(
    spark: SparkSession, path: str, org_id: str, datasource_id: str
) -> Optional[datetime]:
    """Return the datasource's cursor, or None on first run."""
    if not _target_exists(spark, path):
        return None
    rows = (
        spark.read.parquet(path)
        .filter(
            (F.col("org_id") == org_id) & (F.col("datasource_id") == datasource_id)
        )
        .select("next_run_start_from")
        .collect()
    )
    return rows[0][0] if rows else None


def advance_cursor(
    spark: SparkSession,
    path: str,
    org_id: str,
    datasource_id: str,
    processed: DataFrame,
    updated_col: str = "updated",
) -> Optional[datetime]:
    """A8: cursor := max(updated) of the batch, never moving backwards.

    Returns the new cursor (None if the batch was empty — cursor
    unchanged, exactly the reference's empty-run behavior).
    """
    row = processed.agg(F.max(updated_col).alias("mx")).collect()[0]
    if row["mx"] is None:
        return load_cursor(spark, path, org_id, datasource_id)
    prev = load_cursor(spark, path, org_id, datasource_id)
    new = row["mx"] if prev is None or row["mx"] > prev else prev
    upd = spark.createDataFrame([(org_id, datasource_id, new)], _SCHEMA)
    merge_upsert(spark, path, upd, CURSOR_KEYS)
    return new
