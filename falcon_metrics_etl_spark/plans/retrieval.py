"""Lexical retrieval over the documents corpus: BM25 scoring and
top-k ranking for a fixed query — the text-side complement of the
embedding ANN queries (knn_brute_cosine / ann_lsh_bucketed /
ann_ivf_probed in plans/text_pipeline.py, plans/dedup_lsh.py,
plans/ann_ivf.py).

Scale notes: term frequencies are scan-side HOF expressions (JVM
codegen, no explode for a fixed small query); the corpus statistics
(N, total token count, per-term document frequencies) reduce to ONE
single-row aggregate that joins back as a broadcast scalar; the final
top-k is an ORDER BY + LIMIT, which Spark executes as
TakeOrderedAndProject (per-partition heap + driver merge of k rows,
never a global sort). At 100 TB nothing here shuffles more than one
row per partition plus the k winners.

Determinism: scores are doubles, but both engines evaluate the
IDENTICAL expression tree over exact integers (tf, df, dl, N), so the
IEEE results agree bit-for-bit; ties rank by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions import text as TX
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.sources import load_table

BM25_TERMS = ("spark", "join", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def _tf(toks, term: str):
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


@register(
    "bm25_topk",
    doc=f"BM25 top-{BM25_TOPK} retrieval for the fixed query "
    f"{BM25_TERMS}: per-doc term frequencies as scan-side HOF counts, "
    "corpus stats (N, avgdl, per-term df) as one single-row aggregate "
    "broadcast back, Robertson/Sparck-Jones idf "
    "ln(1+(N-df+0.5)/(df+0.5)), and an ORDER BY+LIMIT top-k that "
    "Spark runs as TakeOrderedAndProject — the lexical-retrieval "
    "shape of a training-data curation stack",
    tags=("text", "retrieval", "bm25", "topk", "training-data"),
    oracle=f"""
WITH d AS (
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS dl,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
                           t -> t = '{BM25_TERMS[0]}')) AS tf0,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
                           t -> t = '{BM25_TERMS[1]}')) AS tf1,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
                           t -> t = '{BM25_TERMS[2]}')) AS tf2
    FROM documents
),
stats AS (
    SELECT COUNT(*) AS n_docs,
           SUM(dl) AS sum_dl,
           SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
           SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
           SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
    FROM d
),
scored AS (
    SELECT doc_id, dl,
           ROUND(
             ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
                      / (CAST(df0 AS DOUBLE) + 0.5))
             * (CAST(tf0 AS DOUBLE) * ({BM25_K1} + 1.0))
             / (CAST(tf0 AS DOUBLE) + {BM25_K1}
                * (1.0 - {BM25_B} + {BM25_B} * (CAST(dl AS DOUBLE)
                   / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
           + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
                      / (CAST(df1 AS DOUBLE) + 0.5))
             * (CAST(tf1 AS DOUBLE) * ({BM25_K1} + 1.0))
             / (CAST(tf1 AS DOUBLE) + {BM25_K1}
                * (1.0 - {BM25_B} + {BM25_B} * (CAST(dl AS DOUBLE)
                   / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
           + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
                      / (CAST(df2 AS DOUBLE) + 0.5))
             * (CAST(tf2 AS DOUBLE) * ({BM25_K1} + 1.0))
             / (CAST(tf2 AS DOUBLE) + {BM25_K1}
                * (1.0 - {BM25_B} + {BM25_B} * (CAST(dl AS DOUBLE)
                   / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
           , 6) AS bm25
    FROM d CROSS JOIN stats
)
SELECT doc_id, dl, bm25 FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOPK}
""",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    d = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[_tf(toks, t).alias(f"tf{i}") for i, t in enumerate(BM25_TERMS)],
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int")).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    # one-row corpus stats — a broadcast scalar join, not a shuffle
    scored = d.join(F.broadcast(stats))

    def term_score(i: int):
        n = F.col("n_docs").cast("double")
        df = F.col(f"df{i}").cast("double")
        tf = F.col(f"tf{i}").cast("double")
        dl = F.col("dl").cast("double")
        avgdl = F.col("sum_dl").cast("double") / n
        idf = F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
        return (
            idf
            * (tf * F.lit(BM25_K1 + 1.0))
            / (
                tf
                + F.lit(BM25_K1)
                * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (dl / avgdl))
            )
        )

    bm25 = F.round(
        term_score(0) + term_score(1) + term_score(2), 6
    ).alias("bm25")
    return (
        scored.select("doc_id", "dl", bm25)
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(BM25_TOPK)
    )
