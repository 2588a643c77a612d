"""Bridge-table refresh and deleted-item reconciliation — SURVEY.md
J6 / J7 / S11.

J6 (context bridge): after a context's membership is re-extracted, the
reference inserts the fresh (context, work item) pairs and deletes the
context's rows **not in** the new id list, in one transaction
(src/workitem/context_workitem_map_processor_aurora.ts:129-224). That
is MERGE ... WHEN NOT MATCHED BY SOURCE AND contextId = :c THEN
DELETE. On parquet the engine partitions the bridge by context_id and
overwrites exactly the refreshed context's partition — the
insert+anti-delete collapses into one dynamic partition overwrite,
one-partition-sized I/O at any table size.

J7 (deleted items): datasource-returned live ids vs stored ids; rows
missing from the source are soft-deleted by setting deleted_at
(src/services/check_deleted_items.ts:195-384). Anti-join + merge of
the flagged rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.sinks.merge import _target_exists, merge_upsert


def refresh_bridge(
    spark: SparkSession,
    path: str,
    context_id: str,
    work_item_ids: DataFrame,
) -> None:
    """J6: full-refresh one context's membership in the bridge table.

    ``work_item_ids``: one-column DataFrame of work_item_id. The bridge
    is partitioned by context_id; dynamic overwrite replaces only this
    context's partition, which *is* the delete-stale + insert-fresh
    transaction (stale pairs simply aren't in the rewritten partition).
    """
    fresh = (
        work_item_ids.select(
            F.col(work_item_ids.columns[0]).cast("string").alias("work_item_id")
        )
        .dropDuplicates(["work_item_id"])  # reference dedupes ids (A10)
        .withColumn("context_id", F.lit(context_id))
        .select("context_id", "work_item_id")
    )
    if _target_exists(spark, path):
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    fresh.write.mode("overwrite").partitionBy("context_id").parquet(path)


def soft_delete_missing(
    spark: SparkSession,
    path: str,
    live_ids: DataFrame,
    keys: Sequence[str] = ("work_item_id",),
    deleted_at: str = "1970-01-01T00:00:00",
    scope: F.Column | None = None,
) -> int:
    """J7: soft-delete rows whose key is absent from ``live_ids``.

    ``scope`` optionally restricts the reconciliation (the reference
    reconciles per datasource batch of 50 ids). Returns the number of
    rows flagged. Deterministic ``deleted_at`` is injected by the
    caller — the engine never reads the wall clock (idempotent re-runs
    produce identical bytes).
    """
    target = spark.read.parquet(path)
    in_scope = target.filter(scope) if scope is not None else target
    gone = (
        in_scope.filter(F.col("deleted_at").isNull())
        .join(live_ids, on=list(keys), how="left_anti")
        .withColumn("deleted_at", F.lit(deleted_at).cast("timestamp"))
    )
    n = gone.count()
    if n:
        merge_upsert(spark, path, gone, keys)
    return n
