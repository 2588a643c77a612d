"""Pins for the parquet-backed maintained-index staging
(session.staged_index, r14): state lands once, rereads plan a scan,
regenerated source data evicts stale versions, concurrent builders
race benignly, and the perf-checkpoint off-switch bypasses staging
entirely. These are the behaviors every incremental query and IVM
twin now relies on."""

from __future__ import annotations

import os

import pytest

from falcon_metrics_etl_spark.session import (
    PERF_CHECKPOINT_CONF,
    STATE_DIR_ENV,
    _data_version,
    staged_index,
)


@pytest.fixture()
def state_root(tmp_path, monkeypatch):
    root = tmp_path / "state"
    monkeypatch.setenv(STATE_DIR_ENV, str(root))
    return root


@pytest.fixture()
def src_dir(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    (d / "data.parquet").write_bytes(b"x" * 64)
    return str(d)


def _build_calls(spark, counter):
    def build():
        counter.append(1)
        return spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string"
        )

    return build


def test_builds_once_then_reads_parquet(spark, state_root, src_dir):
    calls: list = []
    build = _build_calls(spark, calls)
    df1 = staged_index(spark, f"t1:{src_dir}", build, src_dir=src_dir)
    assert sorted((r["id"], r["v"]) for r in df1.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    assert len(calls) == 1
    # second invocation: no rebuild, same values, and the plan is a
    # parquet scan (the audited cold-plan shape)
    df2 = staged_index(spark, f"t1:{src_dir}", build, src_dir=src_dir)
    assert len(calls) == 1
    assert sorted((r["id"], r["v"]) for r in df2.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    plan = df2._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan


def test_regenerated_source_evicts_stale_state(
    spark, state_root, src_dir
):
    calls: list = []
    build = _build_calls(spark, calls)
    staged_index(spark, f"t2:{src_dir}", build, src_dir=src_dir)
    v1 = _data_version(src_dir)
    # regenerate the source: size change guarantees a new fingerprint
    # even on coarse-mtime filesystems
    with open(os.path.join(src_dir, "data.parquet"), "wb") as f:
        f.write(b"y" * 128)
    v2 = _data_version(src_dir)
    assert v1 != v2
    staged_index(spark, f"t2:{src_dir}", build, src_dir=src_dir)
    assert len(calls) == 2  # rebuilt for the new version
    entries = [
        e for e in os.listdir(state_root) if e.startswith("t2_")
    ]
    # the stale version is evicted, exactly one live version remains
    assert len(entries) == 1 and entries[0].endswith(v2)


def test_distinct_keys_do_not_cross_evict(spark, state_root, src_dir):
    calls: list = []
    build = _build_calls(spark, calls)
    staged_index(spark, f"k:{src_dir}/sf0.1", build, src_dir=src_dir)
    staged_index(spark, f"k:{src_dir}/sf0.01", build, src_dir=src_dir)
    staged_index(spark, f"k:{src_dir}/sf0.1", build, src_dir=src_dir)
    assert len(calls) == 2  # sf0.01 build must not evict sf0.1 state
    assert len(os.listdir(state_root)) == 2


def test_conf_off_bypasses_staging(spark, state_root, src_dir):
    calls: list = []
    build = _build_calls(spark, calls)
    old = spark.conf.get(PERF_CHECKPOINT_CONF, "true")
    spark.conf.set(PERF_CHECKPOINT_CONF, "false")
    try:
        df = staged_index(spark, f"t3:{src_dir}", build, src_dir=src_dir)
        assert len(calls) == 1
        assert df.count() == 2
        assert not state_root.exists() or not any(
            e.startswith("t3_") for e in os.listdir(state_root)
        )
    finally:
        spark.conf.set(PERF_CHECKPOINT_CONF, old)


def test_concurrent_builders_race_benignly(spark, state_root, src_dir):
    """Two threads building the same missing key: one rename wins,
    the loser reads the winner's state, values identical, exactly one
    state dir remains (no leaked tmp)."""
    import threading

    barrier = threading.Barrier(2)
    out: dict = {}

    def build():
        return spark.createDataFrame([(7, "z")], "id long, v string")

    def worker(tag):
        barrier.wait()
        df = staged_index(spark, f"t4:{src_dir}", build, src_dir=src_dir)
        out[tag] = [(r["id"], r["v"]) for r in df.collect()]

    ts = [
        threading.Thread(target=worker, args=(i,)) for i in range(2)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert out[0] == out[1] == [(7, "z")]
    entries = [e for e in os.listdir(state_root) if e.startswith("t4_")]
    assert len(entries) == 1
    assert ".tmp-" not in entries[0]
