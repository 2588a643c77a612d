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


def test_regenerated_source_retires_then_gc_evicts(
    spark, state_root, src_dir
):
    """r15 (verdict #1): a rebuild only MARKS the stale version
    retired — a concurrent reader of the old version keeps its files
    — and gc_staged_state deletes it after the grace period."""
    from falcon_metrics_etl_spark.session import gc_staged_state
    from falcon_metrics_etl_spark.state import RETIRED_MARKER

    calls: list = []
    build = _build_calls(spark, calls)
    old_df = staged_index(spark, f"t2:{src_dir}", build, src_dir=src_dir)
    v1 = _data_version(src_dir)
    # regenerate the source: size change guarantees a new fingerprint
    # even on coarse-mtime filesystems
    with open(os.path.join(src_dir, "data.parquet"), "wb") as f:
        f.write(b"y" * 128)
    v2 = _data_version(src_dir)
    assert v1 != v2
    staged_index(spark, f"t2:{src_dir}", build, src_dir=src_dir)
    assert len(calls) == 2  # rebuilt for the new version
    entries = sorted(
        e for e in os.listdir(state_root) if e.startswith("t2_")
    )
    # deferred eviction: BOTH versions on disk, the stale one stamped
    assert len(entries) == 2
    stale = next(e for e in entries if e.endswith(v1))
    assert os.path.isfile(
        os.path.join(state_root, stale, RETIRED_MARKER)
    )
    # the reader that planned against the old version still succeeds
    assert old_df.count() == 2
    # within grace: nothing removed; past grace: the stale version goes
    assert gc_staged_state(grace_seconds=3600) == 0
    assert gc_staged_state(grace_seconds=0) == 1
    entries = [e for e in os.listdir(state_root) if e.startswith("t2_")]
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


def test_manifest_beats_walk_and_regeneration_evicts(
    spark, state_root, src_dir
):
    """r15 (verdict #3): with a version manifest present, the staged
    version comes from the manifest token — file churn WITHOUT a new
    manifest does not rebuild (the staging job owns the version), and
    rewriting the manifest routes consumers to fresh state."""
    from falcon_metrics_etl_spark.session import write_version_manifest

    calls: list = []
    build = _build_calls(spark, calls)
    write_version_manifest(src_dir, version="snap-1")
    v_manifest = _data_version(src_dir)
    staged_index(spark, f"t5:{src_dir}", build, src_dir=src_dir)
    assert len(calls) == 1
    # churn a file: the walk fingerprint would change, the manifest
    # token has not — no rebuild, same version
    with open(os.path.join(src_dir, "data.parquet"), "wb") as f:
        f.write(b"z" * 256)
    assert _data_version(src_dir) == v_manifest
    staged_index(spark, f"t5:{src_dir}", build, src_dir=src_dir)
    assert len(calls) == 1
    # a new manifest token (the staging job republished) rebuilds
    write_version_manifest(src_dir, version="snap-2")
    assert _data_version(src_dir) != v_manifest
    staged_index(spark, f"t5:{src_dir}", build, src_dir=src_dir)
    assert len(calls) == 2
    # default manifest: the walk fingerprint at write time
    tok = write_version_manifest(src_dir)
    assert tok and isinstance(tok, str)


def test_explicit_data_version_token(spark, state_root, src_dir):
    """An explicit data_version token keys the state without touching
    the source tree at all (catalog-driven deployments)."""
    calls: list = []
    build = _build_calls(spark, calls)
    staged_index(spark, "t6", build, data_version="cat-7")
    staged_index(spark, "t6", build, data_version="cat-7")
    assert len(calls) == 1
    staged_index(spark, "t6", build, data_version="cat-8")
    assert len(calls) == 2


def test_colliding_slugs_get_distinct_namespaces(
    spark, state_root, src_dir
):
    """r14 advisor: 'k:/a_b' and 'k:/a/b' sanitize to the same pretty
    slug; the key-hash suffix keeps their state (and eviction
    namespaces) apart."""
    calls: list = []
    build = _build_calls(spark, calls)
    staged_index(spark, "k:/a_b", build, src_dir=src_dir)
    staged_index(spark, "k:/a/b", build, src_dir=src_dir)
    assert len(calls) == 2
    assert len(os.listdir(state_root)) == 2
    # and a rebuild of one never stamps the other retired
    from falcon_metrics_etl_spark.state import RETIRED_MARKER

    with open(os.path.join(src_dir, "data.parquet"), "wb") as f:
        f.write(b"w" * 96)
    staged_index(spark, "k:/a_b", build, src_dir=src_dir)
    assert len(calls) == 3
    live = [
        e
        for e in os.listdir(state_root)
        if not os.path.isfile(
            os.path.join(state_root, e, RETIRED_MARKER)
        )
    ]
    assert len(live) == 2  # new k:/a_b version + untouched k:/a/b
