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
* appends operate on the RESOLVED path (new files inside the current
  snapshot dir — additive, reader-safe by construction); keyed merges
  go through ``merge_state`` (survivors + updates land as a NEW
  snapshot + repoint — never an in-place overwrite a reader could
  race); full rewrites go through ``overwrite_state``. Compaction
  runs in the tick's maintenance window (single writer per state dir
  — the ticks' existing contract), so an append never races a
  repoint.

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


def gc_grace_seconds() -> float:
    raw = os.environ.get(GC_GRACE_ENV)
    if raw is not None:
        try:
            return float(raw)
        except ValueError:
            pass
    return DEFAULT_GC_GRACE_SECONDS


def _is_remote(path: str) -> bool:
    return path.startswith(_REMOTE_SCHEMES)


def resolve_state_path(path: str) -> str:
    """Resolve a state-table path to the dir a reader should scan.

    Flat tables (and remote paths) resolve to themselves; versioned
    tables resolve through the ``_CURRENT`` pointer to the live
    snapshot dir. Resolution is plan-time: the returned dir is an
    immutable snapshot that outlives a concurrent rewrite for at
    least the GC grace period.

    A pointer whose target dir is MISSING raises: falling back to the
    flat layout there would silently serve an empty (or stale) table
    for a state that demonstrably existed — corruption must be loud
    (r15 self-review #5). The only writers that remove a pointed-to
    snapshot are grace-period GC (never the current target) and a
    mid-publish crash window; both deserve an error, not zero rows.
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
    if not name:
        return path
    if os.path.isdir(cand):
        return cand
    raise FileNotFoundError(
        f"state table {path}: _CURRENT points at missing snapshot "
        f"{name!r} — the version dir was removed outside the GC "
        "protocol (or a publish crashed mid-swap); restage the table"
    )


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


def mark_retired(
    dir_path: str, marker: str = RETIRED_MARKER, refresh: bool = False
) -> None:
    """Retirement stamp. Default is FIRST-TOUCH (repeated sweeps must
    not extend a retired dir's life); ``refresh=True`` resets the
    stamp to now — used by the publisher at the actual supersede
    moment, so a stray earlier stamp (a cross-process GC that raced a
    publish) can never make the grace clock start before the snapshot
    stopped being current (r15 self-review #3)."""
    p = os.path.join(dir_path, marker)
    try:
        if os.path.exists(p):
            if refresh:
                os.utime(p)
            return
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
    try:
        prev = resolve_state_path(path)
    except FileNotFoundError:
        # dangling pointer: overwrite_state IS the repair tool — the
        # publish below installs a valid pointer again
        prev = path
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
        # refresh: the supersede moment IS the retirement moment —
        # never inherit a stray earlier stamp's clock
        mark_retired(prev, refresh=True)
    elif _flat_entries(path):
        mark_retired(path, FLAT_RETIRED_MARKER, refresh=True)
    return vdir


LAYOUT_FILE = "_LAYOUT"


def claim_state_layout(
    state_dir: str, token: str, guard_tables=()
) -> None:
    """Record or verify the fingerprint LAYOUT a state dir was built
    with (r15 self-review #1: the audio sphash bands changed 8x8 ->
    4x16 between rounds, and probing an old-layout index with
    new-layout bands silently re-admits duplicates — layout changes
    must be loud).

    First caller stamps ``_LAYOUT``; later callers verify and raise
    on mismatch (restage the state dir). A dir with NO stamp but
    existing data in any ``guard_tables`` predates layout stamping —
    that is also a mismatch we cannot verify, so it raises too."""
    if _is_remote(state_dir):
        return
    os.makedirs(state_dir, exist_ok=True)
    p = os.path.join(state_dir, LAYOUT_FILE)
    try:
        with open(p, encoding="utf-8") as f:
            found = f.read().strip()
    except OSError:
        for t in guard_tables:
            tp = os.path.join(state_dir, t)
            try:
                if _flat_entries(tp) or os.path.isfile(
                    os.path.join(tp, CURRENT_POINTER)
                ):
                    raise ValueError(
                        f"state dir {state_dir} holds data in {t!r} but "
                        f"carries no {LAYOUT_FILE} stamp — it was built "
                        "by a version that predates layout stamping and "
                        f"cannot be verified against {token!r}; restage "
                        "it (or stamp it manually after confirming the "
                        "fingerprint layout matches)"
                    )
            except OSError:
                pass
        tmp = os.path.join(
            state_dir, f".layout-tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        )
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(token)
        os.replace(tmp, p)
        return
    if found != token:
        raise ValueError(
            f"state dir {state_dir} was built with fingerprint layout "
            f"{found!r} but this code produces {token!r} — probing a "
            "mismatched index silently re-admits duplicates; restage "
            "the state dir"
        )


def merge_state(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys,
    schema: Optional[str] = None,
) -> None:
    """Keyed MERGE into a state table through the versioned protocol
    (r15 self-review #5): survivors (target anti-join updates on
    ``keys``) union updates land as a NEW snapshot + atomic repoint.
    Unlike ``merge_upsert``'s in-place static overwrite this never
    deletes files a concurrent reader resolved — and because the read
    side (old snapshot) and write side (new snapshot dir) are
    different directories, there is no read-write cycle to break with
    checkpoints. Last-write-wins on ``keys`` like merge_upsert.

    For the ticks' small unpartitioned state tables this is also
    CHEAPER than merge_upsert's stage-then-rewrite (one full write
    instead of two). Remote paths fall through to merge_upsert
    (snapshot isolation comes from a table format there)."""
    keys = list(keys)
    updates = updates.dropDuplicates(keys)
    if _is_remote(path):
        from falcon_metrics_etl_spark.sinks.merge import merge_upsert

        merge_upsert(spark, path, updates, keys)
        return
    rp = resolve_state_path(path)
    if not _table_exists(spark, rp):
        if schema is not None:
            target = spark.createDataFrame([], schema)
            merged = target.join(
                updates.select(keys), on=keys, how="left_anti"
            ).unionByName(updates, allowMissingColumns=True)
        else:
            merged = updates
        overwrite_state(merged, path)
        return
    target = spark.read.parquet(rp)
    survivors = target.join(updates.select(keys), on=keys, how="left_anti")
    overwrite_state(
        survivors.unionByName(updates, allowMissingColumns=True), path
    )


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
    try:
        current = os.path.basename(resolve_state_path(path))
    except FileNotFoundError:
        # dangling pointer: the table is corrupted — readers raise
        # loudly; GC must not destroy the surviving evidence
        return 0
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
            # re-resolve at deletion time: a publish may have made
            # this entry current AFTER the loop's snapshot of the
            # pointer — never delete the live target
            try:
                if entry == os.path.basename(resolve_state_path(path)):
                    continue
            except FileNotFoundError:
                continue
            shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
            removed += 1
    flat_marker = os.path.join(path, FLAT_RETIRED_MARKER)
    try:
        flat_age = now - os.stat(flat_marker).st_mtime
    except OSError:
        flat_age = None
    if flat_age is None and current != os.path.basename(path) and \
            _flat_entries(path):
        # versioned table with live flat data and NO flat stamp: the
        # publish that superseded the flat layout crashed before
        # marking it (r15 self-review #4) — stamp now so the grace
        # clock starts instead of leaking the full pre-compaction
        # copy forever
        mark_retired(path, FLAT_RETIRED_MARKER)
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
    # the staged-index root (session.staged_index) shares the same
    # deferred-eviction discipline and has no window of its own —
    # sweep it whenever a tick sweeps its state dir
    from falcon_metrics_etl_spark.session import gc_staged_state

    gc_staged_state(grace_seconds=grace_seconds)
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
