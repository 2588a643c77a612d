"""As-of and bucketed range joins (operators/asof.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.asof import (
    asof_join,
    range_join_bucketed,
)


def ts(day, hour=0, minute=0):
    return datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("A", ts(1, 9), 100.0, "q1"),
            ("A", ts(1, 11), 101.0, "q2"),
            ("A", ts(2, 9), 99.0, "q3"),
            ("B", ts(1, 10), 50.0, "qb"),
        ],
        "sym string, qts timestamp, price double, quote_id string",
    )
    trades = spark.createDataFrame(
        [
            ("A", ts(1, 10), "t1"),   # after q1
            ("A", ts(1, 11), "t2"),   # ties q2 exactly
            ("A", ts(3, 9), "t3"),    # after q3
            ("B", ts(1, 9), "t4"),    # before any B quote
            ("C", ts(1, 9), "t5"),    # key with no quotes at all
        ],
        "sym string, tts timestamp, trade_id string",
    )
    return quotes, trades


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_asof_backward_inclusive(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts"
    )
    got = {r["trade_id"]: (r["quote_id"], r["price"]) for r in out.collect()}
    assert got == {
        "t1": ("q1", 100.0),
        "t2": ("q2", 101.0),   # equal ts matches (inclusive)
        "t3": ("q3", 99.0),
        "t4": (None, None),
        "t5": (None, None),
    }


def test_asof_strict_excludes_equal_ts(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        strict=True,
    )
    got = {r["trade_id"]: r["quote_id"] for r in out.collect()}
    assert got["t2"] == "q1"   # equal-ts quote no longer eligible


def test_asof_inner_drops_unmatched(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        how="inner",
    )
    assert sorted(r["trade_id"] for r in out.collect()) == ["t1", "t2", "t3"]


def test_asof_payload_is_one_right_row(spark):
    """A right row with a null column must not borrow that column from
    an older right row — the payload travels as one struct."""
    right = spark.createDataFrame(
        [("k", ts(1), "old", "keep"), ("k", ts(2), "new", None)],
        "k string, rts timestamp, a string, b string",
    )
    left = spark.createDataFrame(
        [("k", ts(3))], "k string, lts timestamp"
    )
    row = asof_join(left, right, ["k"], "lts", "rts").collect()[0]
    assert (row["a"], row["b"]) == ("new", None)


def test_asof_rejects_colliding_columns(spark, quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError):
        asof_join(
            trades.withColumn("price", F.lit(1.0)), quotes,
            on=["sym"], left_ts="tts", right_ts="qts",
        )


def test_range_join_bucketed_boundaries(spark):
    events = spark.createDataFrame(
        [
            ("u", 1, ts(1, 0)),    # == start: included
            ("u", 2, ts(1, 12)),   # inside
            ("u", 3, ts(2, 0)),    # == end: excluded
            ("u", 4, ts(5, 0)),    # outside any window
            ("v", 5, ts(1, 12)),   # other key, no window
        ],
        "user_id string, event_id int, ts timestamp",
    )
    wins = spark.createDataFrame(
        [
            ("u", "w1", ts(1, 0), ts(2, 0)),
            ("u", "w2", ts(1, 18), ts(3, 6)),  # spans bucket boundary
        ],
        "user_id string, win_id string, start_ts timestamp, end_ts timestamp",
    )
    out = range_join_bucketed(
        events, wins, ["user_id"], "ts", "start_ts", "end_ts", bucket="1 day"
    )
    got = sorted((r["event_id"], r["win_id"]) for r in out.collect())
    assert got == [(1, "w1"), (2, "w1"), (3, "w2")]


def test_range_join_matches_naive_inequality_join(spark):
    import random

    rng = random.Random(7)
    events = spark.createDataFrame(
        [
            (f"u{rng.randint(0, 5)}", i, ts(rng.randint(1, 20), rng.randint(0, 23)))
            for i in range(300)
        ],
        "user_id string, event_id int, ts timestamp",
    )
    wins = spark.createDataFrame(
        [
            (f"u{rng.randint(0, 5)}", f"w{i}", ts(d := rng.randint(1, 18)),
             ts(d + rng.randint(1, 3), rng.randint(0, 23)))
            for i in range(40)
        ],
        "user_id string, win_id string, start_ts timestamp, end_ts timestamp",
    )
    fast = range_join_bucketed(
        events, wins, ["user_id"], "ts", "start_ts", "end_ts", bucket="1 day"
    )
    naive = events.join(wins, "user_id").filter(
        (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts"))
    )
    cols = ["user_id", "event_id", "win_id"]
    assert _rows(fast, *cols) == _rows(naive, *cols)


def test_asof_matches_naive_on_random_data(spark):
    import random

    rng = random.Random(20260813)
    left = spark.createDataFrame(
        [
            (f"k{rng.randint(0, 8)}", i, ts(rng.randint(1, 25), rng.randint(0, 23)))
            for i in range(400)
        ],
        "k string, lid int, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (f"k{rng.randint(0, 8)}", 1000 + i,
             ts(rng.randint(1, 25), rng.randint(0, 23)))
            for i in range(150)
        ],
        "k string, rid int, rts timestamp",
    ).dropDuplicates(["k", "rts"])  # unique right ts per key (asof contract)

    fast = asof_join(left, right, ["k"], "lts", "rts")

    from pyspark.sql import Window

    cand = left.join(right, "k", "left").filter(
        F.col("rts").isNull() | (F.col("rts") <= F.col("lts"))
    )
    w = Window.partitionBy("k", "lid").orderBy(F.col("rts").desc_nulls_last())
    naive = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "lid", "rid")
    )
    # left rows whose every right candidate was filtered out vanish from
    # cand -> re-add via anti join with null rid
    missing = left.join(naive.select("k", "lid"), ["k", "lid"], "left_anti").select(
        "k", "lid", F.lit(None).cast("int").alias("rid")
    )
    naive_full = naive.unionByName(missing)

    assert _rows(fast, "k", "lid", "rid") == _rows(naive_full, "k", "lid", "rid")


def test_asof_join_ignores_null_right_timestamps(spark):
    """A right row with a null timestamp must never be carried as a
    match (nulls-first ordering would put it at the head of every key
    partition)."""
    from falcon_metrics_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 5, "L1")], "key string, ts int, lv string"
    )
    right = spark.createDataFrame(
        [("k", None, "bogus"), ("k", 3, "real")],
        "key string, ts int, rv string",
    )
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="ts", how="left"
    ).collect()
    assert len(out) == 1 and out[0]["rv"] == "real"
    # with ONLY the null-ts right row, a left join yields no payload
    right2 = spark.createDataFrame(
        [("k", None, "bogus")], "key string, ts int, rv string"
    )
    out2 = asof_join(
        left, right2, on=["key"], left_ts="ts", right_ts="ts", how="left"
    ).collect()
    assert len(out2) == 1 and out2[0]["rv"] is None
