"""Vector column functions for similarity search / embedding dedup.

Determinism strategy: float32 embeddings are quantized to fixed-point
BIGINTs (scale 2^20 — exact, since a float32 mantissa times 2^20 fits
a double with room to spare). Dot products and norms are then *exact
integer arithmetic* (64-dim, |v|<=2^21 => dot <= 2^48 < 2^53), so the
result is identical regardless of summation order or engine; the final
cosine is one double expression over exact integers. This is what lets
a Spark plan and a DuckDB oracle hash-match on float-derived values.

At scale the quantized form is also cheaper to shuffle (int64 vs
struct-of-float) and the integer dot product vectorizes JVM-side via
higher-order functions — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FIXED_POINT_SCALE = 1_048_576  # 2^20


def quantize(vec: Column) -> Column:
    """array<float> -> array<bigint> fixed-point representation."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * FIXED_POINT_SCALE).cast("long")
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def int_norm_sq(a: Column) -> Column:
    return int_dot(a, a)


def cosine_from_int(dot: Column, norm_sq_a: Column, norm_sq_b: Column) -> Column:
    """Cosine from exact integer dot/norms — single deterministic
    double expression."""
    return dot.cast("double") / F.sqrt(norm_sq_a.cast("double")) / F.sqrt(
        norm_sq_b.cast("double")
    )
