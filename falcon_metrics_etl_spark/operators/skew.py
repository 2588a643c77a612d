"""Skew mitigation for hot-key joins and aggregations.

At 100 TB a handful of hot keys (one giant org, one pathological
work item) can pin an entire shuffle behind a single reducer. Two
complementary tools:

- AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
  on by default in session.py) handles sort-merge joins whose skew is
  visible in shuffle statistics at runtime. It does NOT help when the
  skewed side feeds a windowed/grouped computation, or when the join
  is already broadcast-ineligible for other reasons.
- Explicit salting (this module) for the cases AQE can't see:
  ``salted_join`` spreads each hot key of the big side over
  ``salt`` sub-keys and replicates the matching small-side rows, so
  the per-reducer work is bounded by ``rows(hot_key)/salt``.

Salting is deterministic across task retries: the salt is derived
from a hash of the row's own columns (plus a seed), never from
``rand()`` over an unstable row order.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(
    df: DataFrame,
    salt: int,
    cols: Sequence[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Add a deterministic ``__salt`` column in [0, salt).

    The salt hashes ALL columns by default (or ``cols`` if given) so
    identical keys land on different sub-keys whenever any other
    attribute differs; fully duplicate rows share a salt, which is
    correct (they carry identical work anyway).
    """
    hash_cols = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(F.lit(seed), *hash_cols), F.lit(salt)).cast("int"),
    )


def replicate_over_salt(df: DataFrame, salt: int) -> DataFrame:
    """Cross the (small) side with every salt value: rows * salt."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt``
    sub-partitions and the small side replicated ``salt`` times.

    ``big`` is the skewed side and must be the LEFT side of the join;
    supported ``how``: inner, left / left_outer, left_semi, left_anti
    (for right/full joins swap the inputs and flip the join type —
    replicating the *big* side would multiply rows incorrectly).

    Result equals ``big.join(small, on, how)`` (small-side duplicates
    on the join keys behave exactly as they would unsalted), with the
    shuffle key extended to (keys..., __salt). Use when one key holds
    ≫ 1/parallelism of the rows and the small side is still too big or
    too dynamic to broadcast.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} with `big` on the "
            f"left, got {how!r}; swap sides for right-flavored joins"
        )
    keys = list(on)
    b = with_salt(big, salt, seed=seed)
    s = replicate_over_salt(small, salt)
    out = b.join(s, keys + [SALT_COL], how)
    return out.drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (keys..., __salt) computing ``partial_aggs``
    (alias -> expression over the raw rows); phase 2 groups by keys
    computing ``final_aggs`` (alias -> expression over the phase-1
    aliases). Spark's hash aggregate already partial-aggregates
    map-side for algebraic functions; this helper matters for the
    holistic ones (collect_list/collect_set/count_distinct) where all
    rows of a key otherwise meet in one reducer.

    Example — distinct users per (org) with a whale org:
        salted_agg(df, ["org"],
                   {"u": F.collect_set("user_id")},
                   {"n_users": F.size(F.array_distinct(F.flatten(F.collect_list("u"))))})
    """
    p1 = (
        with_salt(df, salt, seed=seed)
        .groupBy(*keys, SALT_COL)
        .agg(*[c.alias(a) for a, c in partial_aggs.items()])
    )
    return p1.groupBy(*keys).agg(
        *[c.alias(a) for a, c in final_aggs.items()]
    )
