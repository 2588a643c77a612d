"""Z-order (Morton-curve) clustering for multi-column data locality.

Delta's OPTIMIZE ZORDER BY / Iceberg's sort-order rewrite, done over
plain parquet: interleave the bits of several key columns into one
Morton value and range-partition + sort by it, so each output file
covers a small HYPER-RECTANGLE of the key space instead of a stripe
of just the leading sort key. Parquet row-group min/max stats on BOTH
columns then prune scans filtered on either key — the reason a 100 TB
table clustered this way answers (org, date) AND (date) predicates
without a second copy sorted the other way.

Everything is integer bit arithmetic on 16-bit per-column rank
buckets, expressible identically in any engine — the registered query
`zorder_locality_stats` proves the layout effect by comparing per-file
key spans under Z-order vs a single-column sort, with a DuckDB oracle
replaying the same bit math (bit interleave has no engine-specific
behavior: shifts and masks only).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per column: 2 columns -> 32-bit Morton value


def _to_bucket(col: Column, lo: Column, hi: Column, bits: int = ZBITS) -> Column:
    """Map a numeric column into [0, 2^bits) by linear scaling between
    the column's min and max (computed once, broadcast as scalars)."""
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(
        F.lit((1 << bits) - 1),
        F.floor(frac * ((1 << bits) - 1)).cast("long"),
    )


def morton_interleave(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` bits of x (even positions) and y
    (odd positions) into one long. Pure shift/mask arithmetic —
    bit-identical in any engine."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = (
            z
            + (x.bitwiseAND(F.lit(1 << b)) * F.lit(1 << b))  # bit b -> 2b
            + (y.bitwiseAND(F.lit(1 << b)) * F.lit(1 << (b + 1)))  # -> 2b+1
        )
    return z


def zorder_value(
    df: DataFrame, cols: Sequence[str], bits: int = ZBITS
) -> DataFrame:
    """Append ``__z``: the Morton value of two numeric columns, bucketed
    to ``bits`` bits each against the observed min/max."""
    if len(cols) != 2:
        raise ValueError("zorder_value supports exactly 2 columns")
    bounds = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    )
    out = df.join(F.broadcast(bounds))
    bx = _to_bucket(
        F.col(cols[0]), F.col(f"__lo_{cols[0]}"), F.col(f"__hi_{cols[0]}"), bits
    )
    by = _to_bucket(
        F.col(cols[1]), F.col(f"__lo_{cols[1]}"), F.col(f"__hi_{cols[1]}"), bits
    )
    return out.withColumn("__z", morton_interleave(bx, by, bits)).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def zorder_by(
    df: DataFrame, cols: Sequence[str], n_files: int = 32
) -> DataFrame:
    """Cluster rows for writing: range-partition on the Morton value
    (contiguous Z-curve segments per output file) and sort within each
    partition, so every file's row-group stats cover a tight
    hyper-rectangle of (cols[0], cols[1]). Write the result with
    ``.write.parquet(...)`` — one file per partition."""
    return (
        zorder_value(df, cols)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
