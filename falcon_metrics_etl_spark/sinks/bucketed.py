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


def merge_upsert_bucketed(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: Sequence[str],
    num_buckets: int,
    path: Optional[str] = None,
) -> None:
    """Keyed MERGE into a bucketed (unpartitioned) parquet table —
    the no-target-Exchange variant of ``merge_upsert``.

    The survivors anti-join reads the target through its bucketed
    layout, so the TARGET side plans with no Exchange and no Sort
    (``sortBy`` buckets arrive presorted); only the batch-sized
    updates side shuffles into the bucket partitioning. The merged
    result is repartitioned on the FIRST key into ``num_buckets``
    before the bucketed rewrite — repartition's hash placement is the
    same pmod(murmur3) as the bucket-file assignment, so each task
    holds exactly one bucket and writes one file (no tasks x buckets
    small-file blowup).

    TRADEOFF vs the hive-partitioned ``merge_upsert``: every merge
    rewrites the WHOLE table (Spark cannot maintain bucket layout
    through partition-scoped insertInto — probed: dynamic insertInto
    writes tasks x buckets unbucketable files). Choose this writer
    when merges touch most partitions every tick anyway (the steady
    -state multi-tenant pipeline shape, where per-partition commit
    overhead dominates) and the partitioned writer when batches are
    partition-sparse (backfills, single-org reprocessing).

    Bucket metadata lives in the catalog, so the target is addressed
    as a TABLE; ``path`` makes it external on first creation.
    """
    # bucket on the FULL key tuple: composite keys lead with a
    # low-cardinality partition_key (8 orgs), which alone would hash
    # every row into <=8 live buckets; the full tuple distributes, and
    # the anti-join's keys still cover the bucket columns so the
    # bucketed side satisfies the join distribution without Exchange
    bucket_cols = tuple(keys)
    # repartition BEFORE dropDuplicates: the explicit hash partitioning
    # on the key columns satisfies the dedup aggregate's required
    # distribution, so Catalyst plans it exchange-free — one shuffle
    # where dedup-then-repartition pays two on the same keys, and the
    # create path below writes straight out of it (each task holds
    # exactly one bucket)
    updates = updates.repartition(num_buckets, *bucket_cols).dropDuplicates(
        list(keys)
    )
    # tableExists resolves qualified names across databases and is not
    # fooled by a same-named temp view shadowing the target (listTables
    # name-matching saw only the current database and matched temp
    # views, silently degrading the merge to an overwrite)
    exists = spark.catalog.tableExists(table)
    if exists and spark.catalog.getTable(table).tableType == "TEMPORARY":
        raise ValueError(
            f"merge_upsert_bucketed target {table!r} resolves to a "
            "temporary view, not a catalog table — drop the view or "
            "qualify the table name"
        )
    if not exists:
        write_bucketed(
            updates, table, bucket_cols, num_buckets,
            sort_cols=bucket_cols, path=path,
        )
        return
    # batch-proportional eager checkpoints break the read-write cycle
    # (same contract as merge_upsert — survivors never re-read the
    # table files once the overwrite starts)
    updates = updates.localCheckpoint(eager=True)
    target = spark.table(table)
    survivors = target.join(
        updates.select(*keys), on=list(keys), how="left_anti"
    ).localCheckpoint(eager=True)
    merged = survivors.unionByName(updates, allowMissingColumns=True)
    write_bucketed(
        merged.repartition(num_buckets, *bucket_cols),
        table, bucket_cols, num_buckets,
        sort_cols=bucket_cols, path=path,
    )


def upsert_states_bucketed(
    spark: SparkSession,
    table: str,
    states: DataFrame,
    num_buckets: int = 32,
    path: Optional[str] = None,
) -> None:
    """S9 (states upsert) through the bucketed layout — the writer the
    steady-state multi-tenant pipeline should use (SURVEY S9; the
    reference upserts touch every org every tick,
    state_load_processor_aurora.ts:49-51). A/B at sf0.1: 6.4-8.6 s/tick
    hive-partitioned vs 2.3-3.3 s bucketed."""
    from falcon_metrics_etl_spark.sinks.merge import STATE_KEYS

    merge_upsert_bucketed(
        spark, table, states, STATE_KEYS, num_buckets, path=path
    )


def upsert_snapshots_bucketed(
    spark: SparkSession,
    table: str,
    snapshots: DataFrame,
    num_buckets: int = 32,
    path: Optional[str] = None,
) -> None:
    """S10 (snapshots upsert, 5-column key sql/full_ddl.sql:1197)
    through the bucketed layout. ``snapshot_month`` is synthesized for
    schema parity with the partitioned twin so either writer can read
    the other's rows."""
    from falcon_metrics_etl_spark.sinks.merge import SNAPSHOT_KEYS

    from pyspark.sql import functions as F

    upd = snapshots
    if "snapshot_month" not in upd.columns:
        upd = upd.withColumn(
            "snapshot_month", F.date_format("snapshot_date", "yyyy-MM")
        )
    merge_upsert_bucketed(
        spark, table, upd, SNAPSHOT_KEYS, num_buckets, path=path
    )
