"""Versioned snapshot sink: time travel, partition-granular
copy-on-write, rollback, vacuum (sinks/versioned.py)."""

from __future__ import annotations

import os

from falcon_metrics_etl_spark.sinks.versioned import (
    current_version,
    read_versioned,
    rollback,
    vacuum,
    versioned_merge,
)

SCHEMA = "work_item_id string, org_id string, state string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _table(spark, root, version=None):
    return {
        (r.work_item_id, r.org_id): r.state
        for r in read_versioned(spark, root, version).collect()
    }


def test_versioned_merge_time_travel_and_rollback(spark, tmp_path):
    root = str(tmp_path / "states")
    v0 = versioned_merge(
        spark,
        root,
        _df(spark, [("W-1", "a", "todo"), ("W-2", "b", "todo")]),
        keys=("work_item_id",),
        partition_cols=("org_id",),
    )
    assert v0 == 0 and current_version(root) == 0

    # merge touching only org a: W-1 updated, W-3 inserted
    v1 = versioned_merge(
        spark,
        root,
        _df(spark, [("W-1", "a", "doing"), ("W-3", "a", "todo")]),
        keys=("work_item_id",),
        partition_cols=("org_id",),
    )
    assert v1 == 1
    assert _table(spark, root) == {
        ("W-1", "a"): "doing",
        ("W-3", "a"): "todo",
        ("W-2", "b"): "todo",
    }
    # time travel to v0
    assert _table(spark, root, version=0) == {
        ("W-1", "a"): "todo",
        ("W-2", "b"): "todo",
    }
    # copy-on-write: org b's files still live ONLY in version 0's dir
    assert os.path.isdir(os.path.join(root, "data", "0", "org_id=b"))
    assert not os.path.isdir(os.path.join(root, "data", "1", "org_id=b"))

    rollback(root, 0)
    assert _table(spark, root) == {("W-1", "a"): "todo", ("W-2", "b"): "todo"}
    rollback(root, 1)
    assert _table(spark, root)[("W-1", "a")] == "doing"


def test_versioned_merge_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "states")
    batch = _df(spark, [("W-1", "a", "todo")])
    versioned_merge(spark, root, batch, ("work_item_id",), ("org_id",))
    versioned_merge(spark, root, batch, ("work_item_id",), ("org_id",))
    # redelivery converges: same logical content, just a newer version
    assert _table(spark, root) == {("W-1", "a"): "todo"}


def test_vacuum_deletes_unreferenced_versions(spark, tmp_path):
    root = str(tmp_path / "states")
    versioned_merge(
        spark, root, _df(spark, [("W-1", "a", "v0")]), ("work_item_id",), ("org_id",)
    )
    versioned_merge(
        spark, root, _df(spark, [("W-1", "a", "v1")]), ("work_item_id",), ("org_id",)
    )
    versioned_merge(
        spark, root, _df(spark, [("W-1", "a", "v2")]), ("work_item_id",), ("org_id",)
    )
    deleted = vacuum(root, retain_last=1)
    assert deleted == ["0", "1"]
    # current still reads; old manifests gone
    assert _table(spark, root) == {("W-1", "a"): "v2"}
    try:
        read_versioned(spark, root, version=0)
        raise AssertionError("expected time travel past retention to fail")
    except FileNotFoundError:
        pass


def test_vacuum_keeps_dirs_referenced_by_retained_manifests(spark, tmp_path):
    root = str(tmp_path / "states")
    versioned_merge(
        spark,
        root,
        _df(spark, [("W-1", "a", "x"), ("W-2", "b", "x")]),
        ("work_item_id",),
        ("org_id",),
    )
    # touch only org a; org b stays owned by version 0
    versioned_merge(
        spark, root, _df(spark, [("W-1", "a", "y")]), ("work_item_id",), ("org_id",)
    )
    deleted = vacuum(root, retain_last=1)
    # version 0's dir is still referenced (org b) -> NOT deleted
    assert deleted == []
    assert _table(spark, root) == {("W-1", "a"): "y", ("W-2", "b"): "x"}


def test_unpartitioned_versioning(spark, tmp_path):
    root = str(tmp_path / "dim")
    versioned_merge(spark, root, _df(spark, [("W-1", "a", "todo")]), ("work_item_id",))
    versioned_merge(spark, root, _df(spark, [("W-1", "a", "done")]), ("work_item_id",))
    assert _table(spark, root) == {("W-1", "a"): "done"}
    assert _table(spark, root, version=0) == {("W-1", "a"): "todo"}


def test_incremental_tick_with_versioned_sink(spark, tmp_path):
    """ST1+ST3+versioning composed: each incremental tick commits a
    time-travelable version; a bad batch rolls back in O(1)."""
    from pyspark.sql import functions as F

    from falcon_metrics_etl_spark.streaming.incremental import (
        run_incremental_batch,
    )

    sink = str(tmp_path / "states")
    cursors = str(tmp_path / "cursors")

    def latest_state(histories):
        return histories.groupBy("work_item_id").agg(
            F.max_by("state", "revision").alias("state"),
            F.max("updated").alias("updated"),
        )

    revs = spark.createDataFrame(
        [("W-1", 1, "todo", "2024-01-01 00:00:00")],
        "work_item_id string, revision int, state string, updated string",
    ).withColumn("updated", F.to_timestamp("updated"))
    run_incremental_batch(
        spark, revs, latest_state, sink, ("work_item_id",), cursors,
        versioned=True,
    )
    revs2 = revs.unionByName(
        spark.createDataFrame(
            [("W-1", 2, "oops", "2024-01-02 00:00:00")],
            "work_item_id string, revision int, state string, updated string",
        ).withColumn("updated", F.to_timestamp("updated"))
    )
    run_incremental_batch(
        spark, revs2, latest_state, sink, ("work_item_id",), cursors,
        versioned=True,
    )
    assert {
        r.state for r in read_versioned(spark, sink).collect()
    } == {"oops"}
    rollback(sink, 0)
    assert {
        r.state for r in read_versioned(spark, sink).collect()
    } == {"todo"}


def test_versioned_merge_matches_dict_model_over_random_batches(spark, tmp_path):
    """Model-based check: a sequence of random keyed batches, replayed
    against a plain dict upsert model; every historical version must
    read back exactly as the model stood after that batch."""
    import random

    rng = random.Random(7)
    root = str(tmp_path / "t")
    model: dict = {}
    snapshots = []
    for batch_no in range(5):
        # org is a pure function of the key: partition-scoped MERGE
        # (like the reference's partition_key) does not support a key
        # migrating partitions, so the generator must not produce it
        keys = [rng.randint(1, 8) for _ in range(rng.randint(1, 4))]
        rows = [
            (f"W-{k}", "a" if k % 2 == 0 else "b", f"s{batch_no}-{i}")
            for i, k in enumerate(keys)
        ]
        # last-write-wins within the batch, like the sink's key dedupe:
        # keep the LAST occurrence per key
        dedup = {}
        for wid, org, state in rows:
            dedup[wid] = (wid, org, state)
        versioned_merge(
            spark, root, _df(spark, list(dedup.values())),
            ("work_item_id",), ("org_id",),
        )
        for wid, org, state in dedup.values():
            model[wid] = (wid, org, state)
        snapshots.append(dict(model))

    for version, snap in enumerate(snapshots):
        got = {
            r.work_item_id: (r.work_item_id, r.org_id, r.state)
            for r in read_versioned(spark, root, version).collect()
        }
        assert got == snap, f"version {version} diverged from model"


def test_merge_after_rollback_never_reuses_version_numbers(spark, tmp_path):
    """A merge following rollback(k) must allocate above every committed
    version, not current+1 — otherwise it overwrites data/<k+1> while
    the orphaned v<k+1> manifest still references it."""
    root = str(tmp_path / "t")
    for i in range(3):  # versions 0, 1, 2
        versioned_merge(
            spark, root, _df(spark, [("W-1", "a", f"v{i}")]),
            ("work_item_id",), ("org_id",),
        )
    rollback(root, 0)
    v = versioned_merge(
        spark, root, _df(spark, [("W-1", "a", "after-rb")]),
        ("work_item_id",), ("org_id",),
    )
    assert v == 3  # NOT 1
    # the merge was based on the rolled-back state...
    assert _table(spark, root) == {("W-1", "a"): "after-rb"}
    # ...and the abandoned lineage is intact: time travel still works
    assert _table(spark, root, version=1) == {("W-1", "a"): "v1"}
    assert _table(spark, root, version=2) == {("W-1", "a"): "v2"}


def test_partition_values_with_special_chars_and_null(spark, tmp_path):
    """Hive-escaped partition dir names (':' '/' '=' space) and null
    partition values must round-trip through manifest paths."""
    root = str(tmp_path / "t")
    rows = [
        ("W-1", "org:a/x=1 b", "todo"),
        ("W-2", None, "todo"),
    ]
    versioned_merge(spark, root, _df(spark, rows), ("work_item_id",), ("org_id",))
    assert _table(spark, root) == {
        ("W-1", "org:a/x=1 b"): "todo",
        ("W-2", None): "todo",
    }
    # second merge touching only the weird partition: null partition
    # survives untouched, escaped partition rewrites
    versioned_merge(
        spark, root, _df(spark, [("W-1", "org:a/x=1 b", "doing")]),
        ("work_item_id",), ("org_id",),
    )
    assert _table(spark, root) == {
        ("W-1", "org:a/x=1 b"): "doing",
        ("W-2", None): "todo",
    }
    # and a merge into the NULL partition keeps the escaped one
    versioned_merge(
        spark, root, _df(spark, [("W-3", None, "new")]),
        ("work_item_id",), ("org_id",),
    )
    assert _table(spark, root) == {
        ("W-1", "org:a/x=1 b"): "doing",
        ("W-2", None): "todo",
        ("W-3", None): "new",
    }


def test_table_changes_across_schema_evolution(spark, tmp_path):
    """CDF must survive an additive column: old snapshot lacks it, the
    diff null-fills instead of raising."""
    from falcon_metrics_etl_spark.sinks.versioned import table_changes

    root = str(tmp_path / "t")
    versioned_merge(
        spark, root, _df(spark, [("W-1", "a", "todo")]),
        ("work_item_id",), ("org_id",),
    )
    evolved = spark.createDataFrame(
        [("W-1", "a", "todo", 5), ("W-2", "a", "new", 1)],
        SCHEMA + ", points int",
    )
    versioned_merge(spark, root, evolved, ("work_item_id",), ("org_id",))
    rows = {
        r.work_item_id: r
        for r in table_changes(
            spark, root, 0, 1, ("work_item_id",)
        ).collect()
    }
    # W-1: same visible values but points went null->5 => update
    assert rows["W-1"]._change_type == "update" and rows["W-1"].points == 5
    assert rows["W-2"]._change_type == "insert"
    # reversed direction: the delete row carries old values, null points
    rev = {
        r.work_item_id: r
        for r in table_changes(
            spark, root, 1, 0, ("work_item_id",)
        ).collect()
    }
    assert rev["W-2"]._change_type == "delete"
    assert rev["W-1"].points is None  # old side predates the column


def test_table_changes_between_versions(spark, tmp_path):
    """CDF analog: diff two versions into insert/update/delete rows."""
    from falcon_metrics_etl_spark.sinks.versioned import table_changes

    root = str(tmp_path / "t")
    versioned_merge(
        spark,
        root,
        _df(spark, [("W-1", "a", "todo"), ("W-2", "b", "todo"),
                    ("W-4", "b", "keep")]),
        ("work_item_id",),
        ("org_id",),
    )
    # v1: W-1 updated, W-3 inserted, W-2 "deleted" via a rewrite of its
    # partition that drops it (simulate with a direct merge of survivors)
    versioned_merge(
        spark, root,
        _df(spark, [("W-1", "a", "doing"), ("W-3", "a", "new")]),
        ("work_item_id",), ("org_id",),
    )
    changes = {
        r.work_item_id: r._change_type
        for r in table_changes(
            spark, root, 0, 1, ("work_item_id",)
        ).collect()
    }
    assert changes == {
        "W-1": "update",
        "W-3": "insert",
        "W-2": "unchanged",
        "W-4": "unchanged",
    }
    # reversed direction reports the insert as a delete
    rev = {
        r.work_item_id: r._change_type
        for r in table_changes(
            spark, root, 1, 0, ("work_item_id",)
        ).collect()
    }
    assert rev["W-3"] == "delete" and rev["W-1"] == "update"


def test_versioned_boolean_partition_roundtrip(spark, tmp_path):
    """Spark writes boolean partition dirs lowercase (flag=true); the
    manifest key must match or reads of the committed version fail."""
    from falcon_metrics_etl_spark.sinks.versioned import (
        read_versioned,
        versioned_merge,
    )

    root = str(tmp_path / "vt")
    df = spark.createDataFrame(
        [(1, True, "a"), (2, False, "b")], "id int, flag boolean, v string"
    )
    versioned_merge(spark, root, df, keys=["id"], partition_cols=["flag"])
    # partition values come back as strings — standard Spark hive-layout
    # inference (no boolean inference), same as a plain
    # spark.read.parquet over flag=true dirs; the point here is that the
    # manifest path matches the lowercase dir Spark wrote (a Python
    # str(True) key would raise path-not-found)
    got = {r["id"]: (r["flag"], r["v"]) for r in read_versioned(spark, root).collect()}
    assert got == {1: ("true", "a"), 2: ("false", "b")}
    # merge into one partition only — the other carries over by manifest
    upd = spark.createDataFrame([(1, True, "a2")], "id int, flag boolean, v string")
    versioned_merge(spark, root, upd, keys=["id"], partition_cols=["flag"])
    got2 = {r["id"]: r["v"] for r in read_versioned(spark, root).collect()}
    assert got2 == {1: "a2", 2: "b"}
