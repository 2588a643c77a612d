"""Skew-salting helpers: result equality with the unsalted plan, and
the salt actually spreading a hot key over multiple sub-keys."""

import pytest
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.skew import (
    SALT_COL,
    salted_agg,
    salted_join,
    with_salt,
)


@pytest.fixture(scope="module")
def frames(spark):
    # 'whale' holds 90% of the rows; dim has one row per key plus a
    # key ('nodim') missing from the dim to exercise outer/anti paths.
    rows = [("whale", i, i % 7) for i in range(900)]
    rows += [(f"k{i % 10}", i, i % 5) for i in range(90)]
    rows += [("nodim", i, 1) for i in range(10)]
    big = spark.createDataFrame(rows, "key string, id int, v int")
    dim = spark.createDataFrame(
        [("whale", "W"), ("nodim2", "X")] + [(f"k{i}", f"D{i}") for i in range(10)],
        "key string, label string",
    )
    return big, dim


def sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain_join(frames, how):
    big, dim = frames
    plain = big.join(dim, ["key"], how)
    salted = salted_join(big, dim, ["key"], how, salt=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert sorted_rows(salted.select(*plain.columns)) == sorted_rows(plain)


def test_salted_join_with_duplicate_small_side_keys(spark):
    big = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "key string, id int")
    dim = spark.createDataFrame(
        [("a", "x"), ("a", "y")], "key string, label string"
    )
    plain = big.join(dim, ["key"], "inner")
    salted = salted_join(big, dim, ["key"], "inner", salt=4)
    assert sorted_rows(salted.select(*plain.columns)) == sorted_rows(plain)


def test_salted_join_rejects_right_flavors(frames):
    big, dim = frames
    with pytest.raises(ValueError):
        salted_join(big, dim, ["key"], "right", salt=4)


def test_salt_spreads_hot_key_and_is_deterministic(frames):
    big, _ = frames
    s1 = with_salt(big, 8)
    hot = s1.filter(F.col("key") == "whale")
    n_sub = hot.select(SALT_COL).distinct().count()
    assert n_sub == 8  # 900 rows over 8 salts: all buckets hit
    # deterministic: same input -> same salts (stable across retries)
    s2 = with_salt(big, 8)
    assert sorted_rows(s1) == sorted_rows(s2)


def test_salted_agg_collect_set_distinct_count(frames):
    big, _ = frames
    expected = sorted_rows(
        big.groupBy("key").agg(F.countDistinct("v").alias("n_v"))
    )
    got = salted_agg(
        big,
        ["key"],
        {"vs": F.collect_set("v")},
        {"n_v": F.size(F.array_distinct(F.flatten(F.collect_list("vs")))).cast("long")},
        salt=8,
    )
    assert sorted_rows(got) == expected
