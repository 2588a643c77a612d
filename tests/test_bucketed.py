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
