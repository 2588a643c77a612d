"""Hypertable-style continuous rollups and a portable distinct sketch.

``hypertable_rollup`` — TimescaleDB-continuous-aggregate shape: the
same metrics at several time resolutions in one stacked table
(resolution, bucket_start, keys..., aggs...). Each resolution is an
independent groupBy sharing one scan; the stacked output MERGEs into a
serving table keyed (resolution, bucket_start, keys...) so incremental
runs refresh only touched buckets (pair with sinks/merge.py).

``kmv_distinct`` — K-Minimum-Values distinct-count sketch over
``portable_hash60``: keep the K smallest key hashes per group; with
h_K the K-th smallest on a [0, 2^60) hash space, the estimator is
(K-1) * 2^60 / h_K. Unlike HLL it is exactly reproducible across
engines (pure min-K of a portable hash — the DuckDB oracle computes
the identical number), mergeable (union the hash sets, re-take K
smallest), and the error is ~1/sqrt(K-2). Groups with fewer than K
distinct keys report the exact count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions.text import portable_hash60

HASH_SPACE = float(1 << 60)


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    aggs: dict[str, Column],
    resolutions: Sequence[str] = ("hour", "day", "week"),
) -> DataFrame:
    """Stacked multi-resolution rollup: one row per (resolution,
    bucket_start, keys...). ``aggs``: alias -> aggregate expression;
    ``resolutions``: date_trunc units."""
    parts = []
    for res in resolutions:
        parts.append(
            df.groupBy(
                F.lit(res).alias("resolution"),
                F.date_trunc(res, F.col(ts_col)).alias("bucket_start"),
                *[F.col(c) for c in key_cols],
            ).agg(*[c.alias(a) for a, c in aggs.items()])
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _kmv_sketch(
    df: DataFrame, key_cols: Sequence[str], value_col: str, k: int
) -> DataFrame:
    """The K smallest distinct portable hashes of ``value_col`` per key
    group — the sketch both the single-group estimator and the merged
    set-ops build on. One shuffle; the rank window prunes to K rows per
    group."""
    hashed = df.select(
        *key_cols, portable_hash60(F.col(value_col).cast("string")).alias("__h")
    ).dropDuplicates([*key_cols, "__h"])
    w = Window.partitionBy(*key_cols).orderBy("__h")
    return (
        hashed.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .select(*key_cols, "__h")
    )


def _kmv_estimate(n: Column, hk: Column, k: int) -> Column:
    """(K-1) * 2^60 / h_K, exact count below K.

    floor, not round: floor of an identically-computed double is
    engine-stable; round's half-way tiebreak is not."""
    return (
        F.when(n < k, n)
        .otherwise(
            F.floor((F.lit(float(k - 1)) * F.lit(HASH_SPACE)) / hk).cast(
                "long"
            )
        )
        .cast("long")
    )


def kmv_distinct(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    estimate_col: str = "distinct_est",
) -> DataFrame:
    """KMV distinct estimate of ``value_col`` per key group.

    Exact below K distinct values."""
    topk = _kmv_sketch(df, key_cols, value_col, k)
    return topk.groupBy(*key_cols).agg(
        F.count("*").alias("__n"),
        F.max("__h").alias("__hk"),
    ).select(
        *key_cols,
        _kmv_estimate(F.col("__n"), F.col("__hk"), k).alias(estimate_col),
    )


def kmv_pairwise_set_ops(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise |A|, |B|, |A∪B|, |A∩B| estimates between every pair of
    key groups, from MERGED KMV sketches.

    This is the property that makes KMV the 100 TB distinct sketch:
    sketches merge by unioning the hash sets and re-taking the K
    smallest — so per-partition sketches combine without re-touching
    the raw data, and the union estimator needs only the two K-row
    sketches. The intersection comes from inclusion-exclusion, clamped
    at 0. Everything downstream of the first dedup operates on at most
    K rows per group.
    """
    # the K-row-per-group sketch feeds three consumers (per-group
    # estimates + both pair taggings); a lazy checkpoint computes it
    # once instead of re-running the raw-data dedup per reference
    sketch = (
        _kmv_sketch(
            df.select(F.col(key_col).alias("g"), F.col(value_col)), ["g"],
            value_col, k,
        )
        .withColumnRenamed("__h", "h")
        .localCheckpoint(eager=False)
    )

    per_group = sketch.groupBy("g").agg(
        F.count("*").alias("n"), F.max("h").alias("hk")
    ).select("g", _kmv_estimate(F.col("n"), F.col("hk"), k).alias("est"))

    pairs = (
        per_group.alias("pa")
        .join(per_group.alias("pb"), F.col("pa.g") < F.col("pb.g"))
        .select(
            F.col("pa.g").alias("ga"),
            F.col("pb.g").alias("gb"),
            F.col("pa.est").alias("est_a"),
            F.col("pb.est").alias("est_b"),
        )
    )
    # merged sketch per pair: union the two K-min hash sets (tagging
    # each sketch row with every pair it belongs to via two broadcast
    # equi-joins — no OR-join), dedup, re-take the K smallest
    tags = pairs.select("ga", "gb")
    m1 = sketch.join(F.broadcast(tags), sketch["g"] == tags["ga"]).select(
        "ga", "gb", "h"
    )
    m2 = sketch.join(F.broadcast(tags), sketch["g"] == tags["gb"]).select(
        "ga", "gb", "h"
    )
    wm = Window.partitionBy("ga", "gb").orderBy("h")
    merged = (
        m1.unionByName(m2)
        .dropDuplicates(["ga", "gb", "h"])
        .withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= k)
        .groupBy("ga", "gb")
        .agg(F.count("*").alias("n"), F.max("h").alias("hk"))
        .select(
            "ga",
            "gb",
            _kmv_estimate(F.col("n"), F.col("hk"), k).alias("est_union"),
        )
    )
    return (
        pairs.join(merged, ["ga", "gb"])
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
                F.lit(0).cast("long"),
            ).alias("est_intersect"),
        )
    )
