"""Idempotent keyed MERGE writers over plain parquet — SURVEY.md S9-S13.

The reference loads everything through keyed upserts (states:
src/workitem/state_load_processor_aurora.ts:25-129; snapshots keyed on
the 5-column unique index sql/full_ddl.sql:1197:
src/workitem/snapshot_load_processor_aurora.ts:25-70). Upsert-by-key is
the idempotency contract that makes its at-least-once SQS delivery
safe; the Spark translation is MERGE.

Without a table format that supports row-level MERGE (Delta/Iceberg —
not available in this container), the engine implements the same thing
Delta does underneath: **partition-scoped copy-on-write**.

    merged(partition) = target(partition) ANTI-JOIN updates(keys)
                        UNION BY NAME updates(partition)

and only partitions present in ``updates`` are rewritten
(``spark.sql.sources.partitionOverwriteMode=dynamic``). At 100 TB this
is the crucial property: a batch touching one (org, month) rewrites one
partition, not the table. Unpartitioned targets fall back to a
full-table staged rewrite (correct, but documented as the small-table
path — dims, bridges, cursors).

The read-write cycle (overwriting the path the survivors were read
from) is broken with eager localCheckpoints of the batch-proportional
frames, not a stage dir — each merged row reaches the target in one
parquet write. Spark's dynamic overwrite is job-atomic per partition
via the Hadoop commit protocol; a failed job leaves committed
partitions from the previous run intact. Re-running the same batch
converges (idempotent), which is exactly the reference's redelivery
story (ST2).
"""

from __future__ import annotations

import datetime
import math
import os
from contextlib import contextmanager
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the reference's unique keys (sql/full_ddl.sql:1358, :1197)
STATE_KEYS = ("partition_key", "sort_key")
SNAPSHOT_KEYS = (
    "partition_key",
    "work_item_id",
    "type",
    "revision",
    "snapshot_date",
)


def _target_exists(spark: SparkSession, path: str) -> bool:
    if path.startswith(("s3://", "s3a://", "hdfs://", "abfss://")):
        try:
            spark.read.parquet(path)
            return True
        except Exception:
            return False
    return os.path.isdir(path) and any(
        not n.startswith(("_", ".")) for n in os.listdir(path)
    )


def anti_existing(frame: DataFrame, full: DataFrame, key: str) -> DataFrame:
    """Batch rows whose ``key`` is not already present in the state
    table ``full``, WITHOUT shuffling the state (r14): the state side
    is filtered to the batch's keys by a broadcast semi join (map-side
    over the scan) and the bounded survivor set broadcasts into the
    anti join. Correct whenever ``frame`` is micro-batch-bounded (the
    streaming ticks' append contract); a backfill-sized frame should
    use a plain left_anti join instead."""
    from pyspark.sql import functions as F

    present = full.select(key).join(
        F.broadcast(frame.select(key).distinct()), key, "left_semi"
    )
    return frame.join(F.broadcast(present), key, "left_anti")


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_cols: Optional[Sequence[str]] = None,
) -> None:
    """MERGE ``updates`` into the parquet table at ``path`` on ``keys``.

    Matched rows are replaced by the update row (last-write-wins, like
    the reference's upsert); unmatched update rows are inserted.
    ``updates`` must be unique per key (enforced here with a
    dropDuplicates on the keys, mirroring the reference's pre-load
    dedup, state_load_processor_aurora.ts:92-101).

    Contract: a key must not migrate partitions — partition-scoped
    copy-on-write only rewrites partitions present in ``updates``, so
    a row whose partition value changed would leave its old row
    behind. The reference has the same invariant (org_id is part of
    partition_key); derive partition columns from the merge key.
    """
    updates = updates.dropDuplicates(list(keys))
    if not _target_exists(spark, path):
        writer = _align_to_partitions(updates, partition_cols).write.mode(
            "overwrite"
        )
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(path)
        return

    # mergeSchema: a target written before a column existed still reads
    # with the union schema, so additive evolution (new nullable
    # columns on updates) merges cleanly; removed columns stay, nulled
    # on new rows — the Delta-style additive-evolution contract.
    # Partition values are read VERBATIM (inference off): '0042' must
    # not come back as int 42, or the rewrite lands under a brand-new
    # org=42 dir and duplicates the partition. The updates schema is
    # the type authority — genuine numeric partitions cast back
    # losslessly ('7' -> 7).
    # EAGER checkpoint of the batch up front: the touched-partition
    # enumeration, the anti-join key scan and the final write all read
    # the materialized blocks instead of re-deriving the updates plan
    # (and the final write must not read ``path`` through the updates
    # lineage — see the read-write-cycle note below).
    updates = updates.localCheckpoint(eager=True)
    with _verbatim_partition_reads(spark):
        target = spark.read.option("mergeSchema", "true").parquet(path)
    if partition_cols:
        upd_types = dict(updates.dtypes)
        tgt_types = dict(target.dtypes)
        for c in partition_cols:
            if c in upd_types and tgt_types.get(c) != upd_types[c]:
                casted = F.col(c).try_cast(upd_types[c])
                # guard: a verbatim partition value that does not parse
                # as the updates dtype (e.g. dir org=abc with int
                # updates) would silently null and relocate survivor
                # rows under __HIVE_DEFAULT_PARTITION__ — raise on the
                # lossy mismatch instead. One partition-column-only
                # aggregate; runs only when the dtypes actually differ.
                n_lossy = (
                    target.select(c)
                    .filter(F.col(c).isNotNull() & casted.isNull())
                    .limit(1)
                    .count()
                )
                if n_lossy:
                    raise ValueError(
                        f"merge_upsert: partition column {c!r} has values "
                        f"that do not parse as the updates dtype "
                        f"{upd_types[c]!r} — refusing a lossy partition "
                        "cast (rows would relocate to the null partition)"
                    )
                target = target.withColumn(c, casted)
    if partition_cols:
        # restrict the rewrite to partitions the batch touches: the
        # anti-join reads only those partitions (partition pruning via
        # the IN-list of touched partition tuples), and dynamic
        # overwrite rewrites only them.
        touched = [
            tuple(r) for r in updates.select(*partition_cols).distinct().collect()
        ]
        target = touched_partition_filter(
            target, updates, partition_cols, touched
        )

    # We overwrite the same path we read from, so the read side must be
    # materialized off the target files first (breaking the read-write
    # cycle). EAGER localCheckpoints pin survivors and updates into
    # executor block storage (MEMORY_AND_DISK — large batches spill,
    # they do not OOM): the final write then reads checkpoint blocks,
    # never ``path``, and every merged row reaches the target in
    # EXACTLY ONE parquet write. (The previous implementation staged
    # survivors+updates to a sibling parquet dir and rewrote them —
    # two full disk passes over the merged batch. Delta's MERGE is the
    # same copy-on-write with a transaction log instead of checkpoint
    # blocks.) Cost stays proportional to the batch: only touched
    # partitions flow through the checkpoint. Checkpointing updates
    # (done above) also makes the merge safe when the caller derived
    # ``updates`` from reading this same target path.
    survivors = target.join(
        updates.select(*keys), on=list(keys), how="left_anti"
    ).localCheckpoint(eager=True)
    merged = _align_to_partitions(
        survivors.unionByName(updates, allowMissingColumns=True),
        partition_cols,
    )
    if partition_cols:
        # per-write option, NOT spark.conf.set: a session-wide dynamic
        # mode would silently change every later static partitioned
        # overwrite in the session into a partial one. Durability:
        # dynamic overwrite deletes a touched partition's old files
        # only at job COMMIT, so a mid-write failure leaves the
        # previous data intact — the checkpoint blocks never become
        # the only copy.
        merged.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy(*partition_cols).parquet(path)
    else:
        # unpartitioned small-table path: a STATIC overwrite deletes
        # the target up front, which would make the lineage-truncated
        # checkpoint blocks the only copy of the merged rows while the
        # write is in flight (executor loss then loses data, not just
        # the job). Stage a durable on-disk copy first and write the
        # target from the staged files — the double write is confined
        # to the path the module docstring already scopes to dims/
        # bridges/cursors.
        stage = path.rstrip("/") + "__stage__"
        merged.write.mode("overwrite").parquet(stage)
        spark.read.parquet(stage).write.mode("overwrite").parquet(path)
        _rm(stage)


_PTI_CONF = "spark.sql.sources.partitionColumnTypeInference.enabled"

# depth-counted scoping (r14): concurrent merge_upserts (the ticks'
# repoint/append waves submit independent tables from threads) would
# race a naive save/restore — thread B could capture thread A's
# temporary "false" as its old value and leave the session conf stuck
# off after both exit. Depth and saved value are tracked PER
# SparkSession (confs are session-scoped: two sessions in one process
# must each get their own conf set off and their own value restored).
# The outermost enter of a session saves, its outermost exit restores;
# every thread inside sees inference OFF, which all merge reads want.
import threading as _threading

_PTI_LOCK = _threading.Lock()
_PTI_STATE: dict = {}  # id(session) -> {"depth": int, "old": str}


@contextmanager
def _verbatim_partition_reads(spark: SparkSession):
    """Scope partition-column-type inference OFF around a read: hive
    dir values come back as their verbatim strings ('0042' stays
    '0042', never int 42). Save-restore at the OUTERMOST scope of
    EACH session (see _PTI_STATE) — the conf is session-wide, other
    code may rely on the default, and concurrent merges must not
    clobber each other's restore."""
    key = id(spark)
    with _PTI_LOCK:
        st = _PTI_STATE.setdefault(key, {"depth": 0, "old": "true"})
        if st["depth"] == 0:
            st["old"] = spark.conf.get(_PTI_CONF, "true")
            spark.conf.set(_PTI_CONF, "false")
        st["depth"] += 1
    try:
        yield
    finally:
        with _PTI_LOCK:
            st = _PTI_STATE[key]
            st["depth"] -= 1
            if st["depth"] == 0:
                spark.conf.set(_PTI_CONF, st["old"])
                del _PTI_STATE[key]


# above this many touched tuples, the exact OR-of-ANDs predicate is
# replaced by per-column isin pruning + an exact broadcast semi-join:
# parsing/analyzing a 664-term predicate costs seconds of driver time,
# while the isin superset still prunes the file index and the 664-row
# broadcast join restores exactness for ~free
_TOUCHED_PREDICATE_MAX_TERMS = 64


def touched_partition_filter(
    target: DataFrame,
    updates: DataFrame,
    partition_cols,
    touched,
) -> DataFrame:
    """Restrict ``target`` to exactly the partitions in ``touched``.

    Small touched sets use the literal predicate (simplest plan, full
    partition pruning). Wide sets — real backfills touch hundreds of
    (org, month) tuples — switch to a two-level plan: a per-column
    ``isin`` prune (compact to build, prunes the file index to the
    cartesian SUPERSET of touched values) AND an exact null-safe
    broadcast left-semi join against the updates' distinct partition
    tuples, so no untouched partition within the superset is read
    into survivors and pointlessly rewritten."""
    if len(touched) <= _TOUCHED_PREDICATE_MAX_TERMS:
        return target.filter(
            touched_partition_predicate(partition_cols, touched)
        )
    pred = None
    for i, c in enumerate(partition_cols):
        vals = {t[i] for t in touched}
        non_null = [v for v in vals if v is not None]
        col_pred = F.col(c).isin(non_null) if non_null else F.lit(False)
        if None in vals:
            col_pred = col_pred | F.col(c).isNull()
        pred = col_pred if pred is None else (pred & col_pred)
    pruned = target.filter(pred)
    tuples_df = updates.select(*partition_cols).distinct()
    cond = None
    for c in partition_cols:
        eq = pruned[c].eqNullSafe(tuples_df[c])
        cond = eq if cond is None else (cond & eq)
    return pruned.join(F.broadcast(tuples_df), cond, "left_semi")


def touched_partition_predicate(partition_cols, touched) -> F.Column:
    """Null-safe OR-of-ANDs selecting the given partition tuples.

    struct(...).isin(struct-literals) is NOT usable here: a null
    partition value makes the struct literal VOID-typed and the whole
    predicate fails analysis (DATATYPE_MISMATCH); eqNullSafe matches
    null partitions like any other value.

    Built as ONE parsed SQL expression, not composed Column objects:
    a batch touching many partitions (e.g. 8 orgs x 83 months = 664
    tuples at sf0.1) costs ~2600 py4j round-trips the Column way —
    measured 4.6 s of pure driver time — vs one F.expr call. The OR
    text nests as a BALANCED tree (log depth) because a 664-deep
    linear Or chain overflows the JVM stack inside Catalyst's tree
    transforms (and the parser's recursion) — both failure modes hit
    real backfills, not just adversarial inputs."""

    def _sql_lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, float):
            # repr(inf)/repr(nan) are not SQL; emit the typed literal
            # Spark parses for non-finite doubles
            if math.isnan(v):
                return "CAST('NaN' AS DOUBLE)"
            if math.isinf(v):
                sign = "-" if v < 0 else ""
                return f"CAST('{sign}Infinity' AS DOUBLE)"
            return repr(v)
        if isinstance(v, int):
            return repr(v)
        # typed literals for temporal partition values — quoted str(v)
        # would lean on implicit string->column coercion where the old
        # F.lit path was exactly typed (datetime check first: datetime
        # is a date subclass)
        if isinstance(v, datetime.datetime):
            return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
        if isinstance(v, datetime.date):
            return f"DATE '{v.isoformat()}'"
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"

    terms = []
    for t in touched:
        conj = " AND ".join(
            "(`{}` <=> {})".format(c.replace("`", "``"), _sql_lit(v))
            for c, v in zip(partition_cols, t)
        )
        terms.append(f"({conj})" if conj else "(TRUE)")
    if not terms:
        return F.lit(False)
    while len(terms) > 1:
        terms = [
            f"({terms[i]} OR {terms[i + 1]})"
            if i + 1 < len(terms)
            else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return F.expr(terms[0])


def _align_to_partitions(df: DataFrame, partition_cols) -> DataFrame:
    """Align the write shuffle to the hive-partition columns so each
    output partition is written by as few tasks as possible — without
    this, every task holding rows of a partition emits its own file
    (tasks × partitions tiny files, the classic small-files bomb).
    AQE REBALANCE rather than a plain repartition: skewed partition
    values are still split across tasks at runtime, so one hot
    (org, month) doesn't serialize the whole write."""
    if not partition_cols:
        return df
    # hint() never raises on unknown hint names (the analyzer drops
    # them with a warning), so feature-detect by version instead of
    # try/except: REBALANCE landed in Spark 3.2
    major, minor = (int(x) for x in df.sparkSession.version.split(".")[:2])
    if (major, minor) >= (3, 2):
        return df.hint("rebalance", *partition_cols)
    return df.repartition(*partition_cols)


def _rm(path: str) -> None:
    import shutil

    if not path.startswith(("s3://", "s3a://", "hdfs://", "abfss://")):
        shutil.rmtree(path, ignore_errors=True)


def upsert_states(
    spark: SparkSession,
    path: str,
    states: DataFrame,
    partition_cols: Sequence[str] = ("org_id",),
) -> None:
    """S9: states upsert on (partition_key, sort_key) =
    (state#org, datasource#workItemId) — the composite synthesized at
    state_load_processor_aurora.ts:49-51."""
    merge_upsert(spark, path, states, STATE_KEYS, partition_cols)


def upsert_snapshots(
    spark: SparkSession,
    path: str,
    snapshots: DataFrame,
    partition_cols: Sequence[str] = ("org_id", "snapshot_month"),
) -> None:
    """S10: snapshots upsert on the 5-column unique index
    (sql/full_ddl.sql:1197). Partitioned (org, month) so a re-processed
    item rewrites only the months its history spans."""
    upd = snapshots
    if "snapshot_month" in (partition_cols or ()) and "snapshot_month" not in upd.columns:
        upd = upd.withColumn(
            "snapshot_month", F.date_format("snapshot_date", "yyyy-MM")
        )
    merge_upsert(spark, path, upd, SNAPSHOT_KEYS, partition_cols)
