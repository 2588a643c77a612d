"""Bucketed silver tables — shuffle-free co-located joins at scale.

The heaviest recurring join in the engine is items⨝revisions /
states⨝snapshots on the work-item key (SURVEY.md J4): both sides are
large, so neither broadcasts, and every run pays a full shuffle of
both. Bucketing pre-shuffles ONCE at write time: both tables hashed
into the same number of buckets on the join key mean Spark's planner
drops the Exchange on both sides (bucketed scan -> sort-merge join).
At 100 TB that converts the dominant per-run network cost into a
one-time layout cost — the same trade Delta/Iceberg make with
clustered layouts.

``sortBy`` on the per-item ordering columns additionally lets the
sort-merge join (and window functions over the same key) skip the
in-memory sort for already-sorted buckets.

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in
the catalog; a plain ``.parquet(path)`` write silently drops it —
Spark reads it back as an ordinary directory).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] = (),
    path: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed on ``keys``.

    ``path`` makes it an external table (data at path, metadata in the
    catalog). Joins between tables bucketed on the same keys with the
    same ``num_buckets`` plan without an Exchange on either side.
    """
    writer = (
        df.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def table_is_bucketed(spark: SparkSession, table: str) -> bool:
    """True when the catalog carries bucket metadata for ``table``."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    return any(r["col_name"] == "Num Buckets" for r in rows)
