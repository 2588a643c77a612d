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


# parallel min-K prune buckets (r16, guide §2.5): the per-group rank
# first runs per (hash % buckets) slice, so no group's full
# distinct-hash set ever sorts in ONE window task — a hot key (one
# giant event type) is spread over the buckets; the final per-group
# rank then sees <= buckets*K rows, a constant.
_KMV_PRUNE_BUCKETS = 32
# r17: the prune engages only above this estimated input size (the
# r16 mix gate pattern); the local default keeps the bench on the
# exact single-rank shape.
_KMV_BUCKET_PRUNE_CONF = "spark.falconMetricsEtl.kmvBucketPruneMinBytes"
_KMV_BUCKET_PRUNE_DEFAULT = 256 * 1024 * 1024


def _kmv_sketch(
    df: DataFrame, key_cols: Sequence[str], value_col: str, k: int
) -> DataFrame:
    """The K smallest distinct portable hashes of ``value_col`` per key
    group — the sketch both the single-group estimator and the merged
    set-ops build on. The dedup shuffle partial-aggregates map-side;
    the rank prunes per (group, hash-bucket) in parallel (each
    bucket's bottom-K contains every global-bottom-K member that
    hashes into it), then a bounded per-group rank over the <=
    buckets*K survivors takes the final K rows."""
    from falcon_metrics_etl_spark.session import scale_gate

    hashed = df.select(
        *key_cols, portable_hash60(F.col(value_col).cast("string")).alias("__h")
    ).dropDuplicates([*key_cols, "__h"])
    pruned = hashed
    # r17 (verdict #6): the bucket prune engages only past the size
    # gate — below it the single rank is strictly cheaper (the extra
    # bounded exchange was the r16 A/B's named sub-second cost); both
    # paths are pinned row-identical by tests/test_relational_gates.py
    # forcing the threshold.
    if scale_gate(df, _KMV_BUCKET_PRUNE_CONF, _KMV_BUCKET_PRUNE_DEFAULT):
        # NULL hashes get their own bucket: default ascending order puts
        # NULLS FIRST, and the (single, post-dedup) null row survives both
        # ranks exactly as it did the old one-pass global rank.
        bucketed = hashed.withColumn(
            "__b", F.coalesce(F.col("__h") % _KMV_PRUNE_BUCKETS, F.lit(-1))
        )
        wb = Window.partitionBy(*key_cols, "__b").orderBy("__h")
        pruned = (
            bucketed.withColumn("__r1", F.row_number().over(wb))
            .filter(F.col("__r1") <= k)
        )
    w = Window.partitionBy(*key_cols).orderBy("__h")
    return (
        pruned.withColumn("__rank", F.row_number().over(w))
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
    # r8 fused form (the table_profile 9->2 pattern): collapse the
    # K-row-per-group sketch to ONE ARRAY ROW per group — the window
    # already partitioned by g, so the collect_list aggregate is
    # exchange-free — then every downstream set operation (per-group
    # estimate, pair union-merge, re-take-K, union/intersection
    # estimates) is a plain array EXPRESSION inside the pair join:
    # array_union + array_sort + slice IS "union the hash sets,
    # re-take the K smallest". 2 shuffles total (the sketch's dedup +
    # window), where the row-shaped form paid 9 (per-group aggs, two
    # pair taggings, a pair-keyed dedup + window + agg, and the final
    # pair join each re-keyed). The group frame is tiny (one
    # <=K-element array per group); a lazy checkpoint computes the
    # sketch chain once for both sides of the self-join.
    from falcon_metrics_etl_spark.session import perf_checkpoint

    sketch = _kmv_sketch(
        df.select(F.col(key_col).alias("g"), F.col(value_col)), ["g"],
        value_col, k,
    ).withColumnRenamed("__h", "h")
    groups = perf_checkpoint(
        sketch.groupBy("g").agg(
            F.array_sort(F.collect_list("h")).alias("hs")
        )
    )

    def est_of(hs: Column) -> Column:
        return _kmv_estimate(F.size(hs), F.element_at(hs, -1), k)

    left = groups.select(
        F.col("g").alias("ga"),
        F.col("hs").alias("hs_a"),
        est_of(F.col("hs")).alias("est_a"),
    )
    right = groups.select(
        F.col("g").alias("gb"),
        F.col("hs").alias("hs_b"),
        est_of(F.col("hs")).alias("est_b"),
    )
    merged = F.slice(
        F.array_sort(F.array_union(F.col("hs_a"), F.col("hs_b"))), 1, k
    )
    return (
        left.join(F.broadcast(right), F.col("ga") < F.col("gb"))
        .withColumn("_mh", merged)
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "est_a",
            "est_b",
            est_of(F.col("_mh")).alias("est_union"),
            F.greatest(
                F.col("est_a") + F.col("est_b") - est_of(F.col("_mh")),
                F.lit(0).cast("long"),
            ).alias("est_intersect"),
        )
    )
