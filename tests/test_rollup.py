"""Hypertable rollup: multi-resolution stacking, and incremental
maintenance — a new batch MERGEs only its touched buckets into the
serving table (the continuous-aggregate contract)."""

from datetime import datetime

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.rollup import (
    hypertable_rollup,
    kmv_distinct,
)
from falcon_metrics_etl_spark.sinks.merge import merge_upsert


def ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id int, ts timestamp, event_type string, value double"
    )


def test_rollup_resolutions_consistent(spark):
    rows = [
        (1, datetime(2024, 1, 1, 9, 5), "click", 1.0),
        (2, datetime(2024, 1, 1, 9, 55), "click", 2.0),
        (3, datetime(2024, 1, 1, 14, 0), "click", 4.0),
        (4, datetime(2024, 1, 3, 9, 0), "click", 8.0),
    ]
    out = hypertable_rollup(
        ev(spark, rows), "ts", ["event_type"],
        {"n": F.count(F.lit(1)), "total": F.sum("value")},
    )
    by_res = {}
    for r in out.collect():
        by_res.setdefault(r["resolution"], []).append(r)
    # hour: 9:00 holds 2 events, 14:00 one, day-3 9:00 one
    hours = {str(r["bucket_start"]): (r["n"], r["total"]) for r in by_res["hour"]}
    assert hours["2024-01-01 09:00:00"] == (2, 3.0)
    assert hours["2024-01-01 14:00:00"] == (1, 4.0)
    # every resolution conserves totals
    for res, rs in by_res.items():
        assert sum(r["n"] for r in rs) == 4, res
        assert sum(r["total"] for r in rs) == 15.0, res


def test_rollup_incremental_merge_refreshes_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "rollup")
    day1 = [
        (1, datetime(2024, 1, 1, 9, 0), "click", 1.0),
        (2, datetime(2024, 1, 1, 10, 0), "view", 2.0),
    ]
    aggs = {"n": F.count(F.lit(1)), "total": F.sum("value")}
    keys = ("resolution", "bucket_start", "event_type")

    r1 = hypertable_rollup(ev(spark, day1), "ts", ["event_type"], aggs,
                           resolutions=("hour", "day"))
    merge_upsert(spark, path, r1, keys=keys)

    # late batch: more day-1 9:00 clicks + a brand-new day-2 bucket;
    # recompute affected source slices, merge replaces/adds buckets
    day1_plus = day1 + [(3, datetime(2024, 1, 1, 9, 30), "click", 5.0)]
    day2 = [(4, datetime(2024, 1, 2, 9, 0), "click", 8.0)]
    r2 = hypertable_rollup(ev(spark, day1_plus + day2), "ts", ["event_type"],
                           aggs, resolutions=("hour", "day"))
    merge_upsert(spark, path, r2, keys=keys)

    got = {
        (r["resolution"], str(r["bucket_start"]), r["event_type"]):
            (r["n"], r["total"])
        for r in spark.read.parquet(path).collect()
    }
    assert got[("hour", "2024-01-01 09:00:00", "click")] == (2, 6.0)  # updated
    assert got[("hour", "2024-01-01 10:00:00", "view")] == (1, 2.0)   # untouched
    assert got[("hour", "2024-01-02 09:00:00", "click")] == (1, 8.0)  # new
    assert got[("day", "2024-01-01 00:00:00", "click")] == (2, 6.0)
    assert got[("day", "2024-01-02 00:00:00", "click")] == (1, 8.0)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", f"u{i % 7}") for i in range(100)], "g string, u string"
    )
    row = kmv_distinct(df, ["g"], "u", k=64).collect()[0]
    assert row["distinct_est"] == 7  # exact under K


def test_kmv_pairwise_set_ops_exact_below_k(spark):
    """With fewer than K distinct values per group the sketch is the
    full hash set, so every estimate is EXACT — union, intersection
    and the per-group counts."""
    from falcon_metrics_etl_spark.operators.rollup import kmv_pairwise_set_ops

    rows = (
        [("a", f"u{i}") for i in range(10)]          # a = u0..u9
        + [("b", f"u{i}") for i in range(5, 20)]     # b = u5..u19
        + [("c", f"x{i}") for i in range(4)]         # c disjoint
        + [("a", "u3"), ("b", "u7")]                 # dup rows collapse
    )
    df = spark.createDataFrame(rows, "g string, u string")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in kmv_pairwise_set_ops(df, "g", "u", k=64).collect()
    }
    ab = out[("a", "b")]
    assert (ab["est_a"], ab["est_b"]) == (10, 15)
    assert ab["est_union"] == 20          # u0..u19
    assert ab["est_intersect"] == 5       # u5..u9
    ac = out[("a", "c")]
    assert ac["est_union"] == 14 and ac["est_intersect"] == 0
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}


def test_kmv_pairwise_set_ops_bounds_above_k(spark):
    """Above K the estimates are approximate but must respect set
    algebra: max(|A|,|B|) <= |A∪B| and intersect >= 0."""
    from falcon_metrics_etl_spark.operators.rollup import kmv_pairwise_set_ops

    rows = [("a", f"u{i}") for i in range(500)] + [
        ("b", f"u{i}") for i in range(250, 900)
    ]
    df = spark.createDataFrame(rows, "g string, u string")
    r = kmv_pairwise_set_ops(df, "g", "u", k=32).collect()[0]
    assert r["est_union"] >= max(r["est_a"], r["est_b"])
    assert r["est_intersect"] >= 0
    # K=32 => ~18% stderr; union of 900 should land well inside 3 sigma
    assert 400 <= r["est_union"] <= 1600
