"""SparkSession factory tuned for this engine.

Local mode for tests/bench; the same settings are the ones that matter
on a 1000-executor cluster: AQE (runtime re-plan, skew-join splitting,
partition coalescing), UTC session time zone (the reference normalizes
every datetime to UTC — /root/reference/src/jiracloud/process/
revision_processor.ts:368-370), Arrow for the pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The driver-generated testdata stores TIMESTAMP(NANOS) parquet, which
# Spark only reads as long when this legacy flag is set. It is a SQL
# conf, so it can also be applied at runtime to externally-built
# sessions (see sources.tables.ensure_session_confs).
NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

RUNTIME_CONFS: dict[str, str] = {
    NANOS_CONF: "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # answer bare MIN/MAX/COUNT from parquet footer statistics without
    # scanning rows (cursor-max scans, DQ profiling); no effect on
    # filtered/grouped aggregates
    "spark.sql.parquet.aggregatePushdown": "true",
    # fewer, fatter Arrow batches across the Python boundary: the
    # narrow event-date rows cost ~20% less wall clock at 50k than the
    # 10k default (measured on event_dates_full at sf0.1); fat-payload
    # multimodal rows stay safe at this size (~15 MB/batch worst case),
    # deployments with wider binary rows tune this down
    "spark.sql.execution.arrow.maxRecordsPerBatch": "50000",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "falcon-metrics-etl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# -- optional perf checkpoints ------------------------------------------------
# Conf gating the OPTIONAL shared-subtree checkpoints (kanbanize/
# transform dims, zorder Morton subtree). They exist purely to stop
# Catalyst re-deriving a shared frame per consumer (measured plan wins,
# PLAN_AUDIT_r5); semantics are identical without them.
PERF_CHECKPOINT_CONF = "spark.falconMetricsEtl.perfCheckpoints"


def perf_checkpoint(df):
    """Lazy ``localCheckpoint`` for shared plan subtrees, gated behind
    ``spark.falconMetricsEtl.perfCheckpoints`` (default on).

    RELIABILITY TRADEOFF: a localCheckpoint truncates lineage — after
    materialization, losing an executor that holds checkpoint blocks
    FAILS the job instead of recomputing from source. That is the right
    trade for this workload (short batch jobs, the checkpointed frames
    are small dims or mid-size shared subtrees, and the measured plan
    wins are large), and the wrong one for long-running jobs on
    preemptible/spot executors. Such deployments set the conf to
    "false": every consumer then re-derives the shared frame (more
    shuffles/scans, full lineage-based recovery). eager=False keeps the
    no-job-at-plan-definition contract either way."""
    conf = df.sparkSession.conf.get(PERF_CHECKPOINT_CONF, "true")
    # Boolean-parse loosely: spark-submit / Java Boolean.toString hand us
    # "False"/"FALSE"/" false " and a silent mismatch here would leave
    # lineage-truncating checkpoints ON for a deployment that asked them off.
    if (conf or "").strip().lower() in ("false", "0", "no", "off"):
        return df
    return df.localCheckpoint(eager=False)


# maintained-index staging for the IVM proof twins (r14; r13 used a
# session-scoped eager localCheckpoint, r13 verdict #1 asked for the
# tick-persisted read to be the AUDITED plan): state lands as plain
# parquet under a state root, exactly the shape the streaming ticks
# persist (streaming/cross_modal_tick.stage_cross_modal_state), and
# the twins' audited plans READ it as a parquet scan instead of
# re-deriving the batch closure in-lineage on a cold session.
def run_concurrent(*thunks):
    """Submit independent Spark actions from one driver concurrently
    and return their results in order.

    The streaming ticks' cost is JOB-COUNT dominated at batch scale:
    each per-table append/repoint/checkpoint is a small job whose
    fixed overhead (planning, scheduling, Python worker spin-up)
    outweighs its task work, and running seven of them back to back
    prices seven overheads serially (SCALE.md r13 probe note). Spark
    job submission is thread-safe and the scheduler interleaves
    concurrent jobs across the same executors, so overlapping the
    submissions collapses the serial overhead without touching the
    on-disk layout or the replay contract — each action keeps its own
    failure semantics (the first exception re-raises after all
    complete, so a replay sees the same partially-applied,
    idempotent-by-design state a serial failure leaves).

    Single-thunk calls run inline — no pool overhead on the common
    path."""
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
        errs = []
        out = []
        for f in futures:
            try:
                out.append(f.result())
            except Exception as e:  # noqa: BLE001 — re-raised below
                errs.append(e)
                out.append(None)
        if errs:
            raise errs[0]
        return out


STATE_DIR_ENV = "FALCON_METRICS_STATE_DIR"

# Mixed into every staged-state fingerprint: bump when ANY staged
# builder's OUTPUT changes (a fingerprint/codec/signature fix), so
# persisted state from older code can never silently serve under new
# code — the state root outlives the process, unlike the r13
# session-scoped cache, so code upgrades are a real staleness vector.
STATE_FORMAT_VERSION = "r14.1"

# per-state-path build locks: same-process concurrent builders of one
# key serialize (see staged_index); guarded dict creation
import threading as _threading

_BUILD_LOCKS: dict = {}
_BUILD_LOCKS_GUARD = _threading.Lock()


def _state_root() -> str:
    import tempfile

    # per-user default: a fixed world-writable path would let another
    # local user pre-create (poison) or own (DoS) the state dirs
    uid = getattr(os, "getuid", lambda: "na")()
    return os.environ.get(STATE_DIR_ENV) or os.path.join(
        tempfile.gettempdir(), f"falcon-metrics-state-{uid}"
    )


def _data_version(src_dir: str) -> str:
    """Fingerprint of the source directory's file inventory
    (relpath, size, mtime): staged state is keyed on it, so
    regenerating the data under ``src_dir`` — even mid-session —
    routes every consumer to a fresh state dir instead of silently
    serving stale fingerprints."""
    import hashlib

    h = hashlib.sha256()
    h.update(f"fmt={STATE_FORMAT_VERSION};".encode())
    for root, _dirs, files in sorted(os.walk(src_dir)):
        for fn in sorted(files):
            p = os.path.join(root, fn)
            try:
                st = os.stat(p)
            except OSError:
                continue
            rel = os.path.relpath(p, src_dir)
            h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:16]


def staged_index(spark, key: str, build, src_dir: str | None = None):
    """Persist a maintained-index slice as parquet state ONCE and
    read it back on every invocation.

    The ``*_keep_best_delta`` twins hash-match the full-corpus batch
    oracle — the incremental==batch proof — but production never
    recomputes the base closure per run: the maintained index IS
    persisted state (the streaming ticks lay it out under their
    ``state_dir``; stage_cross_modal_state is the tick-0 backfill).
    This helper gives the registered twins the same economics AND the
    same audited plan: the first invocation anywhere builds the slice
    and lands it as parquet (atomic rename, ``_SUCCESS``-validated);
    every invocation — including the first in a cold session that
    finds existing state — plans a plain parquet scan, so the cold
    plan prices the delta resolution, not the closure rebuild. The
    staged frame is value-identical to the inline subtree it replaces
    (long/double/string columns round-trip parquet exactly), so
    result hashes are untouched.

    Staleness: state is keyed on ``_data_version(src_dir)`` — a
    fingerprint of the source files — and stale versions of the same
    key are evicted on rebuild, so regenerated source data can never
    serve old fingerprints (and the state root does not accumulate
    dead versions). Concurrent builders race benignly: both write a
    private tmp dir, one atomic-renames it into place, the loser
    deletes its copy and reads the winner's.

    At 100 TB the same contract holds with the state root on shared
    storage and the hot indexes written through sinks/bucketed.py
    (bucketed by their probe keys) — the read side here is already
    the plan shape that exploits that.

    Deployments that disable ``spark.falconMetricsEtl.perfCheckpoints``
    get the raw builder (full lineage, no state dependency)."""
    import re
    import shutil
    import threading
    import uuid

    conf = spark.conf.get(PERF_CHECKPOINT_CONF, "true")
    if (conf or "").strip().lower() in ("false", "0", "no", "off"):
        return build()
    slug = re.sub(r"[^A-Za-z0-9_.-]+", "_", key)
    version = _data_version(src_dir) if src_dir else "v0"
    root = _state_root()
    path = os.path.join(root, f"{slug}-{version}")
    if not os.path.isfile(os.path.join(path, "_SUCCESS")):
        # same-process builders serialize per key (the second waits,
        # then finds the state); cross-process builders race benignly
        # through a UNIQUE tmp dir + atomic rename (a shared tmp name
        # would let two Spark writes clobber each other's _temporary)
        with _BUILD_LOCKS_GUARD:
            lock = _BUILD_LOCKS.setdefault(path, threading.Lock())
        with lock:
            if not os.path.isfile(os.path.join(path, "_SUCCESS")):
                os.makedirs(root, exist_ok=True)
                tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
                try:
                    build().write.mode("overwrite").parquet(tmp)
                except BaseException:
                    # a failed build must not leak its partial tmp dir
                    shutil.rmtree(tmp, ignore_errors=True)
                    raise
                try:
                    os.rename(tmp, path)
                except OSError:
                    # lost a cross-process race: a complete copy
                    # exists — use it
                    shutil.rmtree(tmp, ignore_errors=True)
                # evict EXACT stale versions of this key only — a
                # prefix match would delete live state of a DIFFERENT
                # key whose slug extends this one past a '-'
                # ("...sf1" vs "...sf1-regen"); versions are always 16
                # hex chars. Orphaned tmp dirs of DEAD builder
                # processes (a kill mid-write) are swept too.
                stale = re.compile(
                    re.escape(slug) + r"-[0-9a-f]{16}$"
                )
                orphan = re.compile(
                    re.escape(slug)
                    + r"-[0-9a-f]{16}\.tmp-(\d+)-[0-9a-f]+$"
                )
                for entry in os.listdir(root):
                    if stale.fullmatch(entry) and entry != f"{slug}-{version}":
                        shutil.rmtree(
                            os.path.join(root, entry), ignore_errors=True
                        )
                        continue
                    m = orphan.fullmatch(entry)
                    if m:
                        try:
                            os.kill(int(m.group(1)), 0)
                        except ProcessLookupError:
                            shutil.rmtree(
                                os.path.join(root, entry),
                                ignore_errors=True,
                            )
                        except OSError:
                            pass  # alive under another uid: leave it
    return spark.read.parquet(path)
