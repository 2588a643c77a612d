"""MERGE sink tests — idempotency, last-write-wins, partition-scoped
rewrite (S9/S10), bridge anti-delete (J6), soft delete (J7)."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.sinks import (
    merge_upsert,
    refresh_bridge,
    soft_delete_missing,
    upsert_snapshots,
)


def _states(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                partition_key=f"state#{org}",
                sort_key=f"jira#{wid}",
                org_id=org,
                title=title,
                deleted_at=None,
            )
            for org, wid, title in rows
        ],
        "partition_key string, sort_key string, org_id string, "
        "title string, deleted_at timestamp",
    )


def test_merge_upsert_insert_then_update(spark, tmp_path):
    path = str(tmp_path / "states")
    merge_upsert(
        spark,
        path,
        _states(spark, [("o1", "W-1", "a"), ("o1", "W-2", "b")]),
        keys=("partition_key", "sort_key"),
        partition_cols=("org_id",),
    )
    # update W-2, insert W-3 — W-1 must survive untouched
    merge_upsert(
        spark,
        path,
        _states(spark, [("o1", "W-2", "b2"), ("o1", "W-3", "c")]),
        keys=("partition_key", "sort_key"),
        partition_cols=("org_id",),
    )
    got = {
        r["sort_key"]: r["title"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {"jira#W-1": "a", "jira#W-2": "b2", "jira#W-3": "c"}


def test_merge_upsert_idempotent_redelivery(spark, tmp_path):
    """ST2: replaying the same batch converges to identical state."""
    path = str(tmp_path / "states")
    batch = _states(spark, [("o1", "W-1", "a"), ("o2", "W-9", "z")])
    for _ in range(3):
        merge_upsert(
            spark, path, batch, keys=("partition_key", "sort_key"),
            partition_cols=("org_id",),
        )
    assert spark.read.parquet(path).count() == 2


def test_merge_upsert_rewrites_only_touched_partition(spark, tmp_path):
    path = str(tmp_path / "states")
    merge_upsert(
        spark,
        path,
        _states(spark, [("o1", "W-1", "a"), ("o2", "W-9", "z")]),
        keys=("partition_key", "sort_key"),
        partition_cols=("org_id",),
    )
    o2_files = set(os.listdir(str(tmp_path / "states" / "org_id=o2")))
    merge_upsert(
        spark,
        path,
        _states(spark, [("o1", "W-1", "a2")]),
        keys=("partition_key", "sort_key"),
        partition_cols=("org_id",),
    )
    # untouched partition's files are physically unchanged
    assert set(os.listdir(str(tmp_path / "states" / "org_id=o2"))) == o2_files
    got = {r["sort_key"]: r["title"] for r in spark.read.parquet(path).collect()}
    assert got == {"jira#W-1": "a2", "jira#W-9": "z"}


def test_upsert_snapshots_five_column_key(spark, tmp_path):
    path = str(tmp_path / "snapshots")
    schema = (
        "partition_key string, work_item_id string, type string, "
        "revision int, snapshot_date string, org_id string, state string"
    )
    base = spark.createDataFrame(
        [
            ("snapshot#o1", "W-1", "state_change", 0, "2024-01-05", "o1", "todo"),
            ("snapshot#o1", "W-1", "state_change", 1, "2024-02-07", "o1", "doing"),
        ],
        schema,
    ).withColumn("snapshot_date", F.to_timestamp("snapshot_date"))
    upsert_snapshots(spark, path, base)
    # re-process the item: revision 1 changes state, revision 2 appears
    upd = spark.createDataFrame(
        [
            ("snapshot#o1", "W-1", "state_change", 1, "2024-02-07", "o1", "review"),
            ("snapshot#o1", "W-1", "state_change", 2, "2024-02-09", "o1", "done"),
        ],
        schema,
    ).withColumn("snapshot_date", F.to_timestamp("snapshot_date"))
    upsert_snapshots(spark, path, upd)
    got = spark.read.parquet(path)
    assert got.count() == 3
    assert {
        (r["revision"], r["state"]) for r in got.collect()
    } == {(0, "todo"), (1, "review"), (2, "done")}
    # month partitions derived from snapshot_date
    assert sorted(
        n for n in os.listdir(str(tmp_path / "snapshots" / "org_id=o1"))
        if n.startswith("snapshot_month=")
    ) == ["snapshot_month=2024-01", "snapshot_month=2024-02"]


def test_refresh_bridge_anti_delete(spark, tmp_path):
    path = str(tmp_path / "bridge")
    ids = lambda *xs: spark.createDataFrame(  # noqa: E731
        [(x,) for x in xs], "work_item_id string"
    )
    refresh_bridge(spark, path, "ctx-1", ids("W-1", "W-2", "W-2"))
    refresh_bridge(spark, path, "ctx-2", ids("W-7"))
    # ctx-1 re-extracted: W-2 gone, W-3 new; ctx-2 must be untouched
    refresh_bridge(spark, path, "ctx-1", ids("W-1", "W-3"))
    got = {
        (r["context_id"], r["work_item_id"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {("ctx-1", "W-1"), ("ctx-1", "W-3"), ("ctx-2", "W-7")}


def test_soft_delete_missing(spark, tmp_path):
    path = str(tmp_path / "states")
    merge_upsert(
        spark,
        path,
        _states(spark, [("o1", "W-1", "a"), ("o1", "W-2", "b"), ("o2", "W-9", "z")]),
        keys=("partition_key", "sort_key"),
        partition_cols=("org_id",),
    )
    live = spark.createDataFrame([("jira#W-1",)], "sort_key string")
    n = soft_delete_missing(
        spark,
        path,
        live,
        keys=("sort_key",),
        deleted_at="2024-03-01T00:00:00",
        scope=F.col("org_id") == "o1",
    )
    assert n == 1
    got = {
        r["sort_key"]: r["deleted_at"] is not None
        for r in spark.read.parquet(path).collect()
    }
    # W-2 flagged; W-1 live; o2 out of scope
    assert got == {"jira#W-1": False, "jira#W-2": True, "jira#W-9": False}
    # idempotent: second run flags nothing new (already-deleted skipped)
    assert (
        soft_delete_missing(
            spark, path, live, keys=("sort_key",),
            deleted_at="2024-03-02T00:00:00", scope=F.col("org_id") == "o1",
        )
        == 0
    )


def test_merge_upsert_additive_schema_evolution(spark, tmp_path):
    """A later batch may carry NEW columns: old rows read back with
    nulls there, old columns missing from the update stay on survivors
    (additive evolution, Delta-style)."""
    from falcon_metrics_etl_spark.sinks.merge import merge_upsert

    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame(
        [("k1", "a"), ("k2", "b")], "id string, payload string"
    )
    merge_upsert(spark, path, v1, keys=("id",))

    v2 = spark.createDataFrame(
        [("k2", "b2", 7), ("k3", "c", 9)],
        "id string, payload string, score int",
    )
    merge_upsert(spark, path, v2, keys=("id",))

    got = {
        r["id"]: (r["payload"], r["score"])
        for r in spark.read.option("mergeSchema", "true").parquet(path).collect()
    }
    assert got == {"k1": ("a", None), "k2": ("b2", 7), "k3": ("c", 9)}


def test_merge_upsert_null_partition_value(spark, tmp_path):
    """A null partition value must merge (struct-isin literals fail
    analysis on NULL; the predicate is eqNullSafe-based)."""
    from falcon_metrics_etl_spark.sinks.merge import merge_upsert

    path = str(tmp_path / "nullpart")
    df1 = spark.createDataFrame(
        [(1, "a", "x"), (2, None, "y")], "id int, org string, v string"
    )
    merge_upsert(spark, path, df1, keys=["id"], partition_cols=["org"])
    df2 = spark.createDataFrame(
        [(2, None, "y2"), (3, None, "z")], "id int, org string, v string"
    )
    merge_upsert(spark, path, df2, keys=["id"], partition_cols=["org"])
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "x", 2: "y2", 3: "z"}


def test_merge_upsert_rejects_lossy_partition_cast(spark, tmp_path):
    """A verbatim partition value that does not parse as the updates
    dtype must raise, not silently relocate survivors to the null
    partition."""
    import pytest

    from falcon_metrics_etl_spark.sinks.merge import merge_upsert

    path = str(tmp_path / "lossy")
    df1 = spark.createDataFrame(
        [(1, "abc", "x"), (2, "7", "y")], "id int, org string, v string"
    )
    merge_upsert(spark, path, df1, keys=["id"], partition_cols=["org"])
    df2 = spark.createDataFrame([(3, 7, "z")], "id int, org int, v string")
    with pytest.raises(ValueError, match="lossy partition cast"):
        merge_upsert(spark, path, df2, keys=["id"], partition_cols=["org"])


def test_merge_upsert_numeric_partition_cast_roundtrips(spark, tmp_path):
    """Genuinely numeric verbatim partition values cast back without
    loss and merge normally."""
    from falcon_metrics_etl_spark.sinks.merge import merge_upsert

    path = str(tmp_path / "numpart")
    df1 = spark.createDataFrame(
        [(1, "7", "x"), (2, "8", "y")], "id int, org string, v string"
    )
    merge_upsert(spark, path, df1, keys=["id"], partition_cols=["org"])
    df2 = spark.createDataFrame([(2, 8, "y2")], "id int, org int, v string")
    merge_upsert(spark, path, df2, keys=["id"], partition_cols=["org"])
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "x", 2: "y2"}


def test_merge_upsert_wide_touched_set_two_level_prune(spark, tmp_path):
    """Above _TOUCHED_PREDICATE_MAX_TERMS touched tuples the merge
    switches from the literal OR-of-ANDs predicate to per-column isin
    pruning + an exact broadcast semi-join. Semantics must be
    identical: only touched partitions rewritten, untouched files
    physically untouched — including a partition inside the isin
    CARTESIAN SUPERSET (org present, month present, combination not
    touched)."""
    import os

    from pyspark.sql import functions as F

    path = str(tmp_path / "wide")
    # seed: 10 orgs x 12 months, keyed rows
    seed = spark.createDataFrame(
        [
            (f"o{o}", f"2024-{m:02d}", f"k-{o}-{m}", "v0")
            for o in range(10)
            for m in range(1, 13)
        ],
        "org_id string, month string, k string, v string",
    )
    merge_upsert(
        spark, path, seed, keys=("k",), partition_cols=("org_id", "month")
    )
    # untouched: (o9, 2024-12) — but o9 AND 2024-12 each appear in the
    # touched value sets, so it IS in the isin superset
    probe_dir = str(tmp_path / "wide" / "org_id=o9" / "month=2024-12")
    before = set(os.listdir(probe_dir))
    upd_rows = [
        (f"o{o}", f"2024-{m:02d}", f"k-{o}-{m}", "v1")
        for o in range(10)
        for m in range(1, 13)
        if not (o == 9 and m == 12)
    ]
    # 119 touched tuples > 64: exercises the two-level path
    upd = spark.createDataFrame(
        upd_rows, "org_id string, month string, k string, v string"
    )
    merge_upsert(
        spark, path, upd, keys=("k",), partition_cols=("org_id", "month")
    )
    assert set(os.listdir(probe_dir)) == before
    got = spark.read.parquet(path)
    assert got.count() == 120
    assert got.filter(F.col("v") == "v0").count() == 1  # only (o9, 12)


def test_verbatim_partition_reads_concurrent_restore(spark):
    """Concurrent merge scopes must not clobber each other's conf
    restore (r14: the ticks submit independent merge_upserts from
    threads): every thread inside the scope sees inference OFF, and
    the session conf comes back to its pre-existing value after the
    LAST scope exits — never stuck at a peer's temporary false."""
    import threading
    import time

    from falcon_metrics_etl_spark.sinks.merge import (
        _PTI_CONF,
        _verbatim_partition_reads,
    )

    spark.conf.set(_PTI_CONF, "true")
    seen = []
    barrier = threading.Barrier(4)

    def worker():
        with _verbatim_partition_reads(spark):
            barrier.wait()
            seen.append(spark.conf.get(_PTI_CONF))
            time.sleep(0.05)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert seen == ["false"] * 4
    assert spark.conf.get(_PTI_CONF) == "true"


def test_verbatim_partition_reads_is_per_session(spark):
    """Two sessions in one process, overlapping scopes: each session's
    conf is set off inside ITS scope and each gets its own prior value
    restored (r14: the depth counter is per-session, not global)."""
    from falcon_metrics_etl_spark.sinks.merge import (
        _PTI_CONF,
        _verbatim_partition_reads,
    )

    other = spark.newSession()
    spark.conf.set(_PTI_CONF, "true")
    other.conf.set(_PTI_CONF, "true")
    with _verbatim_partition_reads(spark):
        assert spark.conf.get(_PTI_CONF) == "false"
        # the second session's scope must set ITS conf off too, even
        # while the first session's scope is open
        with _verbatim_partition_reads(other):
            assert other.conf.get(_PTI_CONF) == "false"
        assert other.conf.get(_PTI_CONF) == "true"
        assert spark.conf.get(_PTI_CONF) == "false"
    assert spark.conf.get(_PTI_CONF) == "true"
