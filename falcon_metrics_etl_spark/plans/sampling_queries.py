"""Training-data sampling/packing queries (operators/sampling.py).

All determinism flows from portable_hash60 (md5-derived, identical in
Spark and DuckDB), so the oracles replay the exact hash arithmetic.
The split boundaries are embedded from the SAME Python-accumulated
floats the operator uses (0.8 + 0.1 accumulates to
0.9000000000000001 — a literal 0.9 in the oracle would disagree on
1-in-a-million boundary rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.sampling import (
    deterministic_split,
    pack_sequences,
    sample_stratified_exact,
)
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.sources import load_table

_DUCK_HASH = "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)"
_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
_B1 = repr(0.8)
_B2 = repr(0.8 + 0.1)  # 0.9000000000000001 — matches the operator
PACK_BUDGET = 2048


@register(
    "train_val_test_split",
    doc="Deterministic fractional split by portable-hash range on "
    "doc_id (operators/sampling.py::deterministic_split): membership "
    "is a pure function of the key — stable under reruns, appends, "
    "and repartitioning; no rand() anywhere",
    tags=("sampling", "hash", "training-data"),
    oracle=f"""
SELECT doc_id,
       CASE WHEN frac < {_B1} THEN 'train'
            WHEN frac < {_B2} THEN 'val'
            ELSE 'test' END AS split
FROM (
    SELECT doc_id, ({_DUCK_HASH} % 1000000) / 1000000.0 AS frac
    FROM documents
)
""",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("doc_id").cast("string").alias("k")
    )
    return deterministic_split(docs, "k", _SPLITS).select("doc_id", "split")


@register(
    "stratified_sample_exact",
    doc="Exact stratified sample (operators/sampling.py::"
    "sample_stratified_exact): 5 docs per (lang, source) by portable-"
    "hash rank — a reproducible simple random sample, one shuffle on "
    "the stratum",
    tags=("sampling", "window", "training-data"),
    oracle=f"""
SELECT doc_id, lang, source FROM (
    SELECT doc_id, lang, source,
           ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY {_DUCK_HASH}, CAST(doc_id AS VARCHAR)
           ) AS rn
    FROM documents
) WHERE rn <= 5
""",
)
def stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.col("doc_id").cast("string").alias("k")
    )
    return sample_stratified_exact(docs, ["lang", "source"], "k", 5).select(
        "doc_id", "lang", "source"
    )


@register(
    "sequence_packing",
    doc="Sequential token packing (operators/sampling.py::"
    "pack_sequences): docs hash-ordered within each lang, binned by "
    "running-token-sum div budget — fixed-budget LLM training shards, "
    "never splitting a document, overflow bounded by one doc",
    tags=("packing", "window", "training-data"),
    oracle=f"""
WITH t AS (
    SELECT doc_id, lang, GREATEST(1, n_chars // 4) AS toks,
           {_DUCK_HASH} AS h
    FROM documents
),
c AS (
    SELECT *, SUM(toks) OVER (
        PARTITION BY lang ORDER BY h, CAST(doc_id AS VARCHAR)
        ROWS UNBOUNDED PRECEDING
    ) AS cum
    FROM t
)
SELECT doc_id, lang, toks AS n_tokens,
       CAST(FLOOR((cum - toks) / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
FROM c
""",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("doc_id").cast("string").alias("k"),
        F.expr("greatest(1, n_chars div 4)").alias("n_tokens"),
    )
    packed = pack_sequences(
        docs, "k", "n_tokens", PACK_BUDGET, pack_key_cols=["lang"]
    )
    return packed.select("doc_id", "lang", "n_tokens", "pack_id")
