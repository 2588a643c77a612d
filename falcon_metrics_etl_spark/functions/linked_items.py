"""Linked-items translation — SURVEY.md F10.

Jira issue links come as an array of structs with either an outward or
an inward target; the translation keeps (link type direction name,
target key). Behavioral reference:
/root/reference/src/jiracloud/process/translate_linked_items.ts:3-42.

Pure higher-order-function expression — runs JVM-side.
Expected input element shape:
struct<type: struct<outward string, inward string>,
       outwardIssue: struct<key string>, inwardIssue: struct<key string>>
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def translate_linked_items(issuelinks: Column) -> Column:
    """array<link struct> -> array<struct<type,workItemId>>, dropping
    links with neither an outward nor an inward target."""
    translated = F.transform(
        issuelinks,
        lambda link: F.when(
            link.getField("outwardIssue").isNotNull(),
            F.struct(
                link.getField("type").getField("outward").alias("type"),
                link.getField("outwardIssue").getField("key").alias("workItemId"),
            ),
        ).otherwise(
            F.when(
                link.getField("inwardIssue").isNotNull(),
                F.struct(
                    link.getField("type").getField("inward").alias("type"),
                    link.getField("inwardIssue").getField("key").alias("workItemId"),
                ),
            )
        ),
    )
    cleaned = F.filter(translated, lambda x: x.isNotNull())
    empty = F.array().cast("array<struct<type:string,workItemId:string>>")
    return F.coalesce(cleaned, empty)


def explode_relationships(items, item_col: str = "work_item_id"):
    """Edge table: one row per (fromItem, linkType, toItem) — the
    relationships table shape (sql/full_ddl.sql:1099-1114)."""
    return items.select(
        item_col, F.explode(F.col("linked_items")).alias("link")
    ).select(
        F.col(item_col).alias("from_work_item_id"),
        F.col("link.type").alias("link_type"),
        F.col("link.workItemId").alias("to_work_item_id"),
    )
