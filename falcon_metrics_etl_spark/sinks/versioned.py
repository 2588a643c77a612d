"""Versioned snapshot layer over the parquet MERGE sink — time travel,
rollback, and vacuum without a table format.

Delta/Iceberg aren't in this container (SURVEY.md section 4); the MERGE
writers in ``sinks/merge.py`` already do partition-scoped copy-on-write.
This module adds the other half of what a transaction log buys:

- every merge produces a new immutable VERSION; old data files are
  never overwritten (each version writes into its own ``data/<v>/``
  dir, with unique file names by construction);
- a version MANIFEST maps each logical partition to the version-dir
  that owns its current files — untouched partitions are *referenced*,
  not copied, so a merge touching one (org, month) writes one
  partition's rows regardless of table size;
- ``read_versioned(..., version=k)`` time-travels by reading manifest
  k; ``rollback`` is an O(1) pointer move; ``vacuum`` deletes
  version-dirs no retained manifest references.

Layout:

    <root>/_versions/v<k>.json    manifest per version
    <root>/_versions/_current     latest committed version number
    <root>/data/<k>/<part dirs>   files written by version k

Manifests are tiny JSON (one entry per partition) and written last —
a crashed job leaves the previous ``_current`` intact, so readers
never see a half-committed version (same commit-protocol idea as the
reference's transactional upserts, state_load_processor_aurora.ts:25-129).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.sinks.merge import (
    _align_to_partitions,
    touched_partition_predicate,
)

_UNPARTITIONED = ""


def _vdir(root: str) -> str:
    return os.path.join(root, "_versions")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_vdir(root), f"v{version}.json")


def current_version(root: str) -> Optional[int]:
    cur = os.path.join(_vdir(root), "_current")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        return int(f.read().strip())


def _load_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _max_committed_version(root: str) -> Optional[int]:
    """Highest version number ever committed (scans _versions/), which
    after a rollback can exceed ``current_version``. New merges allocate
    above THIS, never above current — reusing a committed number would
    overwrite a data dir that later (orphaned) manifests still
    reference, corrupting time travel to them."""
    vdir = _vdir(root)
    if not os.path.isdir(vdir):
        return None
    versions = [
        int(name[1:-5])
        for name in os.listdir(vdir)
        if name.startswith("v") and name.endswith(".json")
    ]
    return max(versions) if versions else None


def _commit(root: str, version: int, partitions: dict) -> None:
    os.makedirs(_vdir(root), exist_ok=True)
    with open(_manifest_path(root, version), "w") as f:
        json.dump({"version": version, "partitions": partitions}, f, sort_keys=True)
    # pointer move last: readers see either the old or the new version
    tmp = os.path.join(_vdir(root), "_current.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(_vdir(root), "_current"))


# characters Spark/Hive escape in partition dir names
# (ExternalCatalogUtils.escapePathName: control chars plus this set)
_PATH_ESCAPE_CHARS = frozenset('"#%\'*/:=?\\\x7f{[]^')
_HIVE_NULL_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def _escape_path_name(s: str) -> str:
    return "".join(
        f"%{ord(ch):02X}" if ch < " " or ch in _PATH_ESCAPE_CHARS else ch
        for ch in s
    )


def _partition_value_str(v) -> str:
    """Render a partition value the way Spark renders it in the dir
    name — notably booleans are lowercase ('flag=true'), where Python's
    str() would produce 'flag=True' and the manifest path would miss
    the on-disk dir."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _partition_subdir(cols: Sequence[str], values) -> str:
    """Build the manifest key / read path for one partition tuple with
    the same hive-style escaping Spark applies when writing the dir, so
    manifest paths always match what's on disk (null -> the hive
    default-partition sentinel)."""
    return "/".join(
        f"{_escape_path_name(c)}="
        + (
            _HIVE_NULL_PARTITION
            if v is None
            else _escape_path_name(_partition_value_str(v))
        )
        for c, v in zip(cols, values)
    )


def read_versioned(
    spark: SparkSession, root: str, version: Optional[int] = None
) -> DataFrame:
    """Read the table as of ``version`` (default: current). Groups the
    manifest by owning version-dir — one parquet read per referenced
    version, not per partition."""
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed version at {root}")
    manifest = _load_manifest(root, v)
    by_dir: dict[str, list[str]] = {}
    for part, owner in manifest["partitions"].items():
        by_dir.setdefault(owner, []).append(part)
    pieces = []
    for owner, parts in sorted(by_dir.items()):
        base = os.path.join(root, "data", owner)
        if parts == [_UNPARTITIONED]:
            pieces.append(spark.read.parquet(base))
            continue
        paths = [os.path.join(base, p) for p in parts]
        pieces.append(spark.read.option("basePath", base).parquet(*paths))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def versioned_merge(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_cols: Optional[Sequence[str]] = None,
) -> int:
    """MERGE ``updates`` (last-write-wins on ``keys``) into a new
    version; returns the committed version number.

    Copy-on-write at partition granularity: only partitions present in
    ``updates`` are re-materialized under the new version's dir; every
    other partition entry is carried over unchanged from the previous
    manifest. The merge semantics (key dedupe, anti-join survivors,
    additive schema evolution) and the no-partition-migration contract
    mirror ``sinks/merge.py::merge_upsert``.
    """
    updates = updates.dropDuplicates(list(keys))
    prev = current_version(root)
    max_v = _max_committed_version(root)
    # merge base = current; allocated number = above every committed
    # manifest, so a merge after rollback(k) never reuses k+1
    new_v = 0 if max_v is None else max_v + 1
    out_dir = os.path.join(root, "data", str(new_v))

    if prev is None:
        writer = _align_to_partitions(updates, partition_cols).write.mode(
            "overwrite"
        )
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(out_dir)
        if partition_cols:
            parts = {
                _partition_subdir(partition_cols, t): str(new_v)
                for t in (
                    tuple(r)
                    for r in updates.select(*partition_cols).distinct().collect()
                )
            }
        else:
            parts = {_UNPARTITIONED: str(new_v)}
        _commit(root, new_v, parts)
        return new_v

    manifest = dict(_load_manifest(root, prev)["partitions"])
    target = read_versioned(spark, root, prev)

    if partition_cols:
        touched = [
            tuple(r) for r in updates.select(*partition_cols).distinct().collect()
        ]
        # null-safe match (shared with merge_upsert): a null partition
        # value must still select its old rows as survivors
        target = target.filter(
            touched_partition_predicate(partition_cols, touched)
        )

    survivors = target.join(
        updates.select(*keys).dropDuplicates(list(keys)),
        on=list(keys),
        how="left_anti",
    )
    merged = survivors.unionByName(updates, allowMissingColumns=True)
    writer = _align_to_partitions(merged, partition_cols).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(out_dir)

    if partition_cols:
        for t in touched:
            manifest[_partition_subdir(partition_cols, t)] = str(new_v)
    else:
        manifest = {_UNPARTITIONED: str(new_v)}
    _commit(root, new_v, manifest)
    return new_v


def rollback(root: str, version: int) -> None:
    """Point the table back at an earlier committed version (O(1) —
    no data movement; later versions remain until vacuumed)."""
    if not os.path.exists(_manifest_path(root, version)):
        raise FileNotFoundError(f"version {version} was never committed")
    _commit_pointer_only(root, version)


def _commit_pointer_only(root: str, version: int) -> None:
    tmp = os.path.join(_vdir(root), "_current.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(_vdir(root), "_current"))


def vacuum(root: str, retain_last: int = 1) -> list[str]:
    """Delete version-dirs referenced by NO retained manifest (the
    current version and ``retain_last - 1`` before it are retained).
    Returns the deleted dir names. Time travel earlier than the
    retention window stops working — same contract as Delta VACUUM."""
    cur = current_version(root)
    if cur is None:
        return []
    retained_versions = [v for v in range(max(0, cur - retain_last + 1), cur + 1)]
    referenced: set[str] = set()
    for v in retained_versions:
        path = _manifest_path(root, v)
        if os.path.exists(path):
            referenced |= set(_load_manifest(root, v)["partitions"].values())
    deleted = []
    data_root = os.path.join(root, "data")
    for name in sorted(os.listdir(data_root)):
        if name not in referenced:
            shutil.rmtree(os.path.join(data_root, name), ignore_errors=True)
            deleted.append(name)
    # drop manifests older than the retention window
    for name in os.listdir(_vdir(root)):
        if name.startswith("v") and name.endswith(".json"):
            v = int(name[1:-5])
            if v not in retained_versions:
                os.remove(os.path.join(_vdir(root), name))
    return deleted


def table_changes(
    spark: SparkSession,
    root: str,
    v_from: int,
    v_to: int,
    keys: Sequence[str],
) -> DataFrame:
    """Change data feed between two committed versions (Delta CDF
    analog): full-outer join of the snapshots on ``keys``, each row
    tagged ``_change_type`` in {insert, update, delete, unchanged}.
    Downstream consumers filter out 'unchanged' — it is included so
    callers can also use this as a full diffing read. Column values
    come from the NEW version for inserts/updates and the OLD version
    for deletes. Columns are the UNION of both snapshots' columns
    (null-filled where a side predates an additive schema evolution),
    so the diff works across evolution boundaries."""
    old = read_versioned(spark, root, v_from)
    new = read_versioned(spark, root, v_to)
    val_cols = [c for c in new.columns if c not in keys] + [
        c for c in old.columns if c not in keys and c not in new.columns
    ]
    # dtype for null-fill: the absent side must carry the SAME type as
    # the present side or the struct comparison below fails to resolve
    dtypes = {**dict(old.dtypes), **dict(new.dtypes)}

    def _side(df: DataFrame, prefix: str) -> DataFrame:
        present = set(df.columns)
        return df.select(
            *keys,
            *[
                (
                    F.col(c)
                    if c in present
                    else F.lit(None).cast(dtypes[c])
                ).alias(f"{prefix}{c}")
                for c in val_cols
            ],
        )

    o = _side(old, "__old_")
    n = _side(new, "__new_")
    # presence markers (not value nullness: a legitimately-null value
    # column must not read as "row absent")
    j = o.withColumn("__in_old", F.lit(True)).join(
        n.withColumn("__in_new", F.lit(True)),
        on=list(keys),
        how="full_outer",
    )
    changed = (
        F.struct(*[F.col(f"__old_{c}") for c in val_cols])
        != F.struct(*[F.col(f"__new_{c}") for c in val_cols])
        if val_cols
        else F.lit(False)
    )
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out_vals = [
        F.when(
            F.col("__in_new").isNull(), F.col(f"__old_{c}")
        ).otherwise(F.col(f"__new_{c}")).alias(c)
        for c in val_cols
    ]
    return j.select(*keys, *out_vals, change_type.alias("_change_type"))
