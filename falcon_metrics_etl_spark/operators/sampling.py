"""Deterministic sampling / splitting / packing for training-data
pipelines (BASELINE north-star ops; no reference twin).

Everything keys on ``portable_hash60`` (functions/text.py) — an
md5-derived 60-bit integer identical in Spark and DuckDB — so every
operator here is exactly reproducible across engines, runs, and
cluster layouts: re-running a split after adding data never reshuffles
previously-assigned rows (hash-range membership is a pure function of
the key), which is the property that keeps train/test splits stable as
a 100 TB corpus grows.

- ``deterministic_split``: named fractional splits by hash range.
- ``sample_stratified_exact``: exactly n rows per stratum, chosen by
  hash rank (reproducible "random", no ``rand()``).
- ``pack_sequences``: sequential token packing — documents ordered by
  hash within each pack key, assigned to fixed-token-budget bins by
  running-sum division; the standard sequence-packing prep for LLM
  training shards.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions.text import portable_hash60

_HASH_BUCKETS = 1_000_000


def _hash_frac(key: Column) -> Column:
    """Uniform-ish fraction in [0, 1) from the portable hash."""
    return (portable_hash60(key) % _HASH_BUCKETS) / F.lit(
        float(_HASH_BUCKETS)
    )


def deterministic_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash range on ``key_col``.

    ``splits`` maps name -> fraction (must sum to <= 1; remainder rows
    get the LAST split). Membership depends only on the key: stable
    under reruns, appends, and repartitioning.
    """
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    frac = _hash_frac(F.col(key_col))
    expr = None
    hi = 0.0
    names = list(splits)
    for name in names[:-1]:
        hi += splits[name]
        clause = frac < F.lit(hi)
        expr = (
            F.when(clause, F.lit(name))
            if expr is None
            else expr.when(clause, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def sample_stratified_exact(
    df: DataFrame,
    stratum_cols: Sequence[str],
    key_col: str,
    n_per_stratum: int,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, picked by hash rank.

    The per-stratum window ranks on (hash, key): deterministic, and
    uniform over keys — a reproducible simple random sample without
    ``rand()``'s run-to-run drift. One shuffle on the stratum."""
    w = Window.partitionBy(*stratum_cols).orderBy(
        portable_hash60(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n_per_stratum)
        .drop("__rank")
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    pack_key_cols: Sequence[str] = (),
    pack_col: str = "pack_id",
) -> DataFrame:
    """Sequential token packing: order documents by (hash, key) within
    each pack-key group, then bin by running token sum / budget.

    A document lands in bin floor((cumsum - its tokens) / budget) — the
    bin its first token falls into; documents are never split. Bins can
    overflow by at most one document (the standard streaming-packing
    trade; budget-oversized docs get their own bin). Deterministic and
    one shuffle: everything derives from the hash order.

    ALWAYS pass ``pack_key_cols`` (e.g. a shard id = hash % n_shards)
    at scale — an empty pack key means one global ordered window, which
    Spark executes on a single partition.
    """
    parts = [F.col(c) for c in pack_key_cols]
    w = (
        Window.partitionBy(*parts)
        .orderBy(portable_hash60(F.col(key_col)), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if parts
        else Window.orderBy(
            portable_hash60(F.col(key_col)), F.col(key_col)
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return df.withColumn(
        pack_col,
        F.floor((cum - F.col(token_col)) / F.lit(budget)).cast("long"),
    )


def sampled_percentile_disc(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    sample_key: str,
    q: float,
    keep_mod: int = 4,
) -> DataFrame:
    """Quantile sketch by deterministic sampling: keep rows whose
    portable hash of ``sample_key`` lands in 1/keep_mod of the space,
    then take the discrete percentile per group over the sample.

    Exact percentile_disc sorts every group's full data; the hash
    sample cuts that by keep_mod while staying exactly reproducible
    (same rows survive on any engine/run — the DuckDB twin computes
    the identical result, unlike t-digest/KLL whose internals don't
    transfer). Error follows order-statistics bounds on n/keep_mod
    samples.
    """
    frac_keep = portable_hash60(F.col(sample_key)) % keep_mod == 0
    sampled = df.filter(frac_keep)
    expr = F.expr(
        f"percentile_disc({q}) WITHIN GROUP (ORDER BY {value_col})"
    )
    return sampled.groupBy(*key_cols).agg(expr.alias(f"p{int(q * 100)}"))


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epochs: Sequence[int],
    n_shards: int,
) -> DataFrame:
    """Reproducible per-epoch global shuffle — the training-data
    ordering stage: every epoch must present the corpus in a different
    but DETERMINISTIC order (re-runnable jobs, resumable readers, no
    rand()).

    Each (row, epoch) hashes to ``portable_hash60(key || ':' || epoch)``;
    the shard is the hash mod n_shards and the position is the rank of
    the hash within the shard (key as tie-break). A reader consuming
    shards in (shard, position) order sees a pseudo-random permutation
    that changes completely between epochs but is a pure function of
    (key, epoch) — append-stable and identical on any engine.

    Plan: epochs explode JVM-side (|epochs| small), then ONE shuffle
    partitioned by (epoch, shard) for the rank window; shards bound
    partition size, so no global sort and no single-task ordering.
    """
    ep = F.explode(
        F.array(*[F.lit(int(e)) for e in epochs])
    ).alias("epoch")
    with_key = df.select("*", ep).withColumn(
        "_eh",
        portable_hash60(
            F.concat_ws(":", F.col(key_col).cast("string"), F.col("epoch"))
        ),
    )
    w = Window.partitionBy("epoch", F.col("_eh") % n_shards).orderBy(
        "_eh", key_col
    )
    return (
        with_key.withColumn("shard", (F.col("_eh") % n_shards).cast("int"))
        .withColumn("position", (F.row_number().over(w) - 1).cast("long"))
        .drop("_eh")
    )


def weighted_sample_wor(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    key_out: str = "sample_key",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006, A-Res): each row draws a
    deterministic hash-uniform u in (0, 1] and ranks by ln(u)/w — a
    monotone transform of u^(1/w), so the top-k by this key IS a
    weighted sample without replacement. Distributed shape: the rank
    is a pure per-row function (no shuffle) and the top-k is a
    TakeOrderedAndProject (per-partition heads, no global sort) — at
    100 TB the only coordination is k rows per partition to the
    driver-side final heap. Determinism flows from portable_hash60,
    so reruns, appends of unrelated rows, and repartitioning never
    change the selected set."""
    u = (
        (F.pmod(portable_hash60(F.col(key_col).cast("string")), F.lit(1000000))
         + F.lit(1)).cast("double")
        / F.lit(1000001.0)
    )
    key = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn(key_out, key)
        .orderBy(F.desc(key_out), F.col(key_col))
        .limit(k)
    )
