"""Bucketed tables: same-bucket joins plan WITHOUT an Exchange on
either side, and results equal the plain join."""

import pytest
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.sinks.bucketed import (
    table_is_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    items = spark.createDataFrame(
        [(f"it{i}", f"title {i}") for i in range(200)],
        "work_item_id string, title string",
    )
    revs = spark.createDataFrame(
        [(f"it{i % 200}", r, f"s{r % 3}") for i in range(200) for r in range(3)],
        "work_item_id string, revision int, status string",
    )
    write_bucketed(
        items, "b_items", ["work_item_id"], 8, path=str(base / "items")
    )
    write_bucketed(
        revs, "b_revs", ["work_item_id"], 8,
        sort_cols=["work_item_id", "revision"], path=str(base / "revs"),
    )
    yield "b_items", "b_revs", items, revs
    spark.sql("DROP TABLE IF EXISTS b_items")
    spark.sql("DROP TABLE IF EXISTS b_revs")


def test_bucket_metadata_recorded(spark, bucketed_tables):
    t_items, t_revs, _, _ = bucketed_tables
    assert table_is_bucketed(spark, t_items)
    assert table_is_bucketed(spark, t_revs)


def test_bucketed_join_has_no_exchange_and_matches_plain(spark, bucketed_tables):
    t_items, t_revs, items, revs = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_revs).join(
            spark.table(t_items), "work_item_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        got = sorted(tuple(r) for r in joined.collect())
        want = sorted(tuple(r) for r in revs.join(items, "work_item_id").collect())
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_same_join_shuffles(spark, bucketed_tables):
    """Control: the identical join over plain frames needs Exchanges —
    the bucketed layout is what removes them."""
    _, _, items, revs = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            revs.join(items, "work_item_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_merge_upsert_bucketed_semantics(spark, tmp_path):
    """Keyed MERGE into a bucketed table: matched keys replaced
    (last-write-wins), new keys inserted, in-batch duplicates deduped,
    re-merge idempotent — the same contract as merge_upsert, through
    the no-target-Exchange layout."""
    import re

    from falcon_metrics_etl_spark.sinks.bucketed import (
        merge_upsert_bucketed,
    )

    tbl, path = "mb_states", str(tmp_path / "mb")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    keys = ("partition_key", "sort_key")
    b1 = spark.createDataFrame(
        [("state#1", "k1", "todo"), ("state#1", "k2", "doing"),
         ("state#2", "k3", "done")],
        "partition_key string, sort_key string, state string",
    )
    merge_upsert_bucketed(spark, tbl, b1, keys, 4, path=path)
    # update k2, insert k4, duplicate k4 in-batch (last one kept is
    # either; both rows identical after dedup contract: unique keys)
    b2 = spark.createDataFrame(
        [("state#1", "k2", "done"), ("state#2", "k4", "todo"),
         ("state#2", "k4", "todo")],
        "partition_key string, sort_key string, state string",
    )
    merge_upsert_bucketed(spark, tbl, b2, keys, 4, path=path)
    got = {
        (r["partition_key"], r["sort_key"]): r["state"]
        for r in spark.table(tbl).collect()
    }
    assert got == {
        ("state#1", "k1"): "todo", ("state#1", "k2"): "done",
        ("state#2", "k3"): "done", ("state#2", "k4"): "todo",
    }
    # idempotent redelivery
    merge_upsert_bucketed(spark, tbl, b2, keys, 4, path=path)
    assert spark.table(tbl).count() == 4
    # the table keeps its bucketed layout across merges, and the
    # survivors anti-join reads it bucketed: target side plans with
    # no Exchange (only the checkpointed updates side shuffles)
    from falcon_metrics_etl_spark.sinks.bucketed import table_is_bucketed

    assert table_is_bucketed(spark, tbl)
    upd = b2.localCheckpoint(eager=True)
    surv = spark.table(tbl).join(
        upd.select(*keys), on=list(keys), how="left_anti"
    )
    plan = surv._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert len(re.findall(r"\bExchange\b", plan)) == 1
    # the rewrite repartitions on the bucket function, so the table
    # holds AT MOST one file per bucket id (empty buckets write no
    # file) — the IO-level pin that replaced the retired first-tick
    # wall-time target (SCALE.md r9); without the repartition each
    # task writes a file per bucket it touches (tasks x buckets files)
    import pathlib

    bucket_ids = [
        p.name.split("_")[1].split(".")[0]
        for p in pathlib.Path(path).iterdir()
        if p.name.startswith("part-")
    ]
    assert bucket_ids and len(bucket_ids) == len(set(bucket_ids)), bucket_ids
    assert len(bucket_ids) <= 4
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_merge_upsert_bucketed_schema_evolution(spark, tmp_path):
    """Additive evolution through the bucketed merge: a new nullable
    column on updates lands, survivors carry NULL for it."""
    from falcon_metrics_etl_spark.sinks.bucketed import (
        merge_upsert_bucketed,
    )

    tbl, path = "mb_evo", str(tmp_path / "mb_evo")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    keys = ("partition_key", "sort_key")
    b1 = spark.createDataFrame(
        [("p1", "k1", "todo")],
        "partition_key string, sort_key string, state string",
    )
    merge_upsert_bucketed(spark, tbl, b1, keys, 2, path=path)
    b2 = spark.createDataFrame(
        [("p1", "k2", "doing", 5)],
        "partition_key string, sort_key string, state string, points int",
    )
    merge_upsert_bucketed(spark, tbl, b2, keys, 2, path=path)
    got = {r["sort_key"]: r["points"] for r in spark.table(tbl).collect()}
    assert got == {"k1": None, "k2": 5}
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
