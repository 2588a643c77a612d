"""Reader-safe versioned parquet state tables (r15).

The streaming ticks persist their maintained indexes as plain parquet
under a ``state_dir`` (streaming/{corpus,media,cross_modal}_tick), and
r14's small-file compaction rewrote those tables IN PLACE with a
rename swap — between the two renames the table path briefly did not
exist, so a concurrent reader racing the swap failed with
path-not-found (the r14 advisor's eviction-vs-reader race; same
hazard as ``staged_index``'s inline rmtree of stale versions). This
module replaces the in-place swap with the protocol the r14 verdict
asked for — **versioned state dirs + an atomic pointer file** — which
is the reference's S3-staging durability contract (a writer never
clobbers a key a reader holds — /root/reference/src/workitem/
s3_client.ts:42-61) transplanted to the local state layer:

* a state table at ``path`` is either FLAT (data files directly under
  ``path`` — what the ticks write today) or VERSIONED: ``path``
  contains only a ``_CURRENT`` pointer file plus ``_v-NNNNNN-xxxx``
  snapshot dirs. Every name starts with ``_``, so Spark's file
  listing (and ``sinks.merge._target_exists``) ignores the version
  machinery when pointed at ``path`` itself.
* readers resolve the pointer AT PLAN TIME (``resolve_state_path`` /
  ``read_state``) and then scan one immutable snapshot dir. A rewrite
  lands a NEW snapshot and atomically repoints ``_CURRENT``
  (write-tmp + ``os.replace``); the superseded snapshot is only
  MARKED retired (``_RETIRED`` touch file — underscore-named, so a
  reader mid-scan never sees it as data) and is physically deleted by
  ``gc_state_table`` after a grace period. A reader that resolved the
  old snapshot before the repoint keeps scanning files that still
  exist; a reader that resolves after gets the new snapshot. Both
  succeed — no window where neither layout is readable.
* writers (tick appends, ``merge_upsert``) operate on the RESOLVED
  path, so a compacted table keeps accepting the same append/merge
  protocol inside its current snapshot dir. Compaction runs in the
  tick's maintenance window (single writer per state dir — the ticks'
  existing contract), so an append never races a repoint.

The grace period defaults to ``DEFAULT_GC_GRACE_SECONDS`` and is
tunable via ``FALCON_METRICS_STATE_GC_GRACE_SECONDS``; it bounds how
long a retired snapshot may keep serving an already-planned scan. At
100 TB the same protocol holds with the pointer on shared storage
(object stores swap the ``os.replace`` for a conditional PUT) — the
read side is already pointer-then-scan.

Local-FS implementation: remote paths (s3/hdfs/abfss) pass through
``resolve_state_path`` untouched; cloud deployments get snapshot
isolation from a table format (Delta/Iceberg) instead.
"""

from __future__ import annotations

import math
import os
import re
import shutil
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

CURRENT_POINTER = "_CURRENT"
RETIRED_MARKER = "_RETIRED"
FLAT_RETIRED_MARKER = "_FLAT_RETIRED"
GC_GRACE_ENV = "FALCON_METRICS_STATE_GC_GRACE_SECONDS"
DEFAULT_GC_GRACE_SECONDS = 900.0

_VERSION_DIR_RE = re.compile(r"_v-(\d{6})-[0-9a-f]{8}$")
_REMOTE_SCHEMES = ("s3://", "s3a://", "hdfs://", "abfss://")


def gc_grace_seconds(default: float | None = None) -> float:
    raw = os.environ.get(GC_GRACE_ENV)
    if raw is not None:
        try:
            return float(raw)
        except ValueError:
            pass
    return DEFAULT_GC_GRACE_SECONDS if default is None else default


def _is_remote(path: str) -> bool:
    return path.startswith(_REMOTE_SCHEMES)


def resolve_state_path(path: str) -> str:
    """Resolve a state-table path to the dir a reader should scan.

    Flat tables (and remote paths) resolve to themselves; versioned
    tables resolve through the ``_CURRENT`` pointer to the live
    snapshot dir. Resolution is plan-time: the returned dir is an
    immutable snapshot that outlives a concurrent rewrite for at
    least the GC grace period.
    """
    if _is_remote(path):
        return path
    ptr = os.path.join(path, CURRENT_POINTER)
    try:
        with open(ptr, encoding="utf-8") as f:
            name = f.read().strip()
    except OSError:
        return path
    cand = os.path.join(path, name)
    if name and os.path.isdir(cand):
        return cand
    return path


def _table_exists(spark: SparkSession, path: str) -> bool:
    from falcon_metrics_etl_spark.sinks.merge import _target_exists

    return _target_exists(spark, path)


def read_state(
    spark: SparkSession, path: str, schema: Optional[str] = None
) -> DataFrame:
    """Pointer-resolved read of a state table; with ``schema``, a
    missing table reads as an empty frame (the ticks' cold-start
    contract)."""
    rp = resolve_state_path(path)
    if _table_exists(spark, rp):
        return spark.read.parquet(rp)
    if schema is None:
        raise FileNotFoundError(f"state table missing: {path}")
    return spark.createDataFrame([], schema)


def _next_version_name(path: str) -> str:
    seq = 0
    if os.path.isdir(path):
        for entry in os.listdir(path):
            m = _VERSION_DIR_RE.fullmatch(entry)
            if m:
                seq = max(seq, int(m.group(1)))
    return f"_v-{seq + 1:06d}-{uuid.uuid4().hex[:8]}"


def _publish_pointer(path: str, version_name: str) -> None:
    """Atomically repoint ``_CURRENT`` (write-tmp, fsync, replace)."""
    tmp = os.path.join(
        path, f".current-tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    )
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(version_name)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, CURRENT_POINTER))


def mark_retired(dir_path: str, marker: str = RETIRED_MARKER) -> None:
    """First-touch retirement stamp: the marker's mtime records WHEN
    the snapshot was superseded, so the grace clock starts at the
    repoint, not at whichever later sweep notices it."""
    p = os.path.join(dir_path, marker)
    if not os.path.exists(p):
        try:
            with open(p, "w", encoding="utf-8") as f:
                f.write(str(time.time()))
        except OSError:
            pass


def _flat_entries(path: str) -> list[str]:
    """Data entries of the FLAT layout under ``path`` (everything not
    underscore/dot-named — version dirs and markers are excluded)."""
    if not os.path.isdir(path):
        return []
    return [n for n in os.listdir(path) if not n.startswith(("_", "."))]


def overwrite_state(df: DataFrame, path: str) -> str:
    """Reader-safe overwrite: land ``df`` as a NEW snapshot dir,
    atomically repoint, retire the superseded snapshot (or the flat
    layout). Returns the snapshot dir written. Replaces
    ``mode("overwrite").parquet(path)`` wherever a concurrent reader
    may hold the previous contents."""
    if _is_remote(path):
        df.write.mode("overwrite").parquet(path)
        return path
    os.makedirs(path, exist_ok=True)
    prev = resolve_state_path(path)
    vname = _next_version_name(path)
    vdir = os.path.join(path, vname)
    try:
        df.write.mode("overwrite").parquet(vdir)
    except BaseException:
        shutil.rmtree(vdir, ignore_errors=True)
        raise
    _publish_pointer(path, vname)
    # a stray retirement stamp on the NEW current (a cross-process GC
    # racing the publish window) would start its grace clock early —
    # the current snapshot is by definition not retired
    try:
        os.remove(os.path.join(vdir, RETIRED_MARKER))
    except OSError:
        pass
    if prev != path:
        mark_retired(prev)
    elif _flat_entries(path):
        mark_retired(path, FLAT_RETIRED_MARKER)
    return vdir


def _local_file_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the data files under one snapshot
    dir — a plain os.walk, no Spark job (this is the per-tick
    threshold probe, so it must be cheap)."""
    n = 0
    total = 0
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for fn in files:
            if fn.startswith(("_", ".")):
                continue
            n += 1
            try:
                total += os.stat(os.path.join(root, fn)).st_size
            except OSError:
                pass
    return n, total


def live_file_count(path: str) -> int:
    return _local_file_stats(resolve_state_path(path))[0]


def compact_state_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 8,
    grace_seconds: float | None = None,
) -> dict:
    """Rewrite an over-fragmented state table into ~target-size files
    via the versioned protocol: new snapshot dir, atomic repoint,
    grace-period GC of superseded snapshots. The row multiset —
    including every ``batch_id`` tag — is unchanged, so the tick
    replay contract is intact and a tick can run immediately after.

    Unlike r14's ``_compact_unpartitioned`` swap this is
    concurrent-reader-safe: a reader that planned against the old
    snapshot keeps scanning it (the files persist through the grace
    period); the brief no-table window of the double-rename is gone.
    """
    report = {
        "partitions_compacted": 0,
        "files_before": 0,
        "files_after_target": 0,
        "gc_removed": gc_state_table(path, grace_seconds=grace_seconds),
    }
    if _is_remote(path):
        return report
    rp = resolve_state_path(path)
    if not _table_exists(spark, rp):
        return report
    n_files, total_bytes = _local_file_stats(rp)
    ideal_n = max(1, math.ceil(total_bytes / target_file_bytes))
    if n_files < min_files or n_files <= ideal_n:
        return report
    df = spark.read.parquet(rp).repartition(ideal_n)
    overwrite_state(df, path)
    report.update(
        {
            "partitions_compacted": 1,
            "files_before": n_files,
            "files_after_target": ideal_n,
        }
    )
    return report


def gc_state_table(
    path: str, grace_seconds: float | None = None
) -> int:
    """Physically delete snapshots retired longer than the grace
    period ago (never the pointer's current target), plus the flat
    layout once a versioned snapshot has superseded it. Returns the
    number of entries removed. Safe to call every tick — it is a
    couple of listdirs when nothing qualifies."""
    if _is_remote(path) or not os.path.isdir(path):
        return 0
    grace = gc_grace_seconds() if grace_seconds is None else grace_seconds
    now = time.time()
    current = os.path.basename(resolve_state_path(path))
    removed = 0
    for entry in os.listdir(path):
        if not _VERSION_DIR_RE.fullmatch(entry) or entry == current:
            continue
        marker = os.path.join(path, entry, RETIRED_MARKER)
        try:
            age = now - os.stat(marker).st_mtime
        except OSError:
            # non-current and unmarked: either a publish in flight
            # (transient) or a snapshot whose retirement stamp was
            # lost (a crash between repoint and mark — would leak
            # forever otherwise). Stamp it NOW so its grace clock
            # starts; a racing publish that makes it current clears
            # the stamp (overwrite_state).
            mark_retired(os.path.join(path, entry))
            continue
        if age >= grace:
            shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
            removed += 1
    flat_marker = os.path.join(path, FLAT_RETIRED_MARKER)
    try:
        flat_age = now - os.stat(flat_marker).st_mtime
    except OSError:
        flat_age = None
    if flat_age is not None and flat_age >= grace:
        for entry in _flat_entries(path):
            p = os.path.join(path, entry)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                try:
                    os.remove(p)
                except OSError:
                    pass
            removed += 1
        try:
            os.remove(flat_marker)
        except OSError:
            pass
    return removed


def maintain_state_dir(
    spark: SparkSession,
    state_dir: str,
    file_threshold: int = 64,
    target_file_bytes: int = 32 * 1024 * 1024,
    min_files: int = 8,
    grace_seconds: float | None = None,
) -> dict:
    """The ticks' in-cadence maintenance sweep (r15, wired into every
    ``*_ingest_tick``): for each state table under ``state_dir``,
    GC retired snapshots past grace, and compact any table whose LIVE
    file count exceeds ``file_threshold`` — so a 5-minute-cadence
    deployment keeps probe scans file-count-bounded without manual
    sweeps. The threshold probe is an os.walk per table (no Spark
    job); a tick that stays under threshold pays only listdirs."""
    report: dict = {}
    if _is_remote(state_dir) or not os.path.isdir(state_dir):
        return report
    for entry in sorted(os.listdir(state_dir)):
        p = os.path.join(state_dir, entry)
        if not os.path.isdir(p) or entry.startswith(("_", ".")):
            continue
        removed = gc_state_table(p, grace_seconds=grace_seconds)
        if live_file_count(p) > file_threshold:
            r = compact_state_table(
                spark,
                p,
                target_file_bytes=target_file_bytes,
                min_files=min_files,
                grace_seconds=grace_seconds,
            )
            r["gc_removed"] += removed
            report[entry] = r
        elif removed:
            report[entry] = {"gc_removed": removed}
    return report
