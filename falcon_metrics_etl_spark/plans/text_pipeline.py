"""Training-data pipeline queries: text analysis, dedup, similarity
search over ``documents`` / ``embeddings`` (BASELINE.json extension
operators — first-class alongside the reference's own surface).

Scale notes: every query here is a scan + higher-order-function
projection (JVM codegen, no Python), a hash aggregation, or a
candidate-pair join designed to avoid the O(n^2) cross product at
100 TB (LSH banding in plans registered by dedup_lsh.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions import text as TX
from falcon_metrics_etl_spark.functions import vectors as VX
from falcon_metrics_etl_spark.plans.dedup_lsh import DUCK_LSH_PAIR_CTES
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.sources import load_table

NEAR_DUP_COSINE = 0.4
KNN_K = 5
KNN_N_QUERIES = 5

# shared DuckDB fragment: quantized int vectors (must mirror
# functions.vectors.quantize exactly)
_DUCK_QUANT = (
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))"
)


# --------------------------------------------------------------------------
# Text quality scoring
# --------------------------------------------------------------------------
@register(
    "text_quality_scores",
    doc="Quality scoring: token count, stopword ratio, punctuation ratio, "
    "mean token length — scan-side codegen expressions only",
    tags=("text", "expression"),
    oracle="""
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       ROUND(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                    t -> t IN ('a','the','of','and','to'))) AS DOUBLE)
             / len(string_split_regex(trim(text), '\\s+')), 4) AS stopword_ratio,
       ROUND(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
             / length(text), 4) AS punct_ratio,
       ROUND(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
             / len(string_split_regex(trim(text), '\\s+')), 4) AS mean_token_len
FROM documents
""",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        F.round(TX.stopword_ratio(t), 4).alias("stopword_ratio"),
        F.round(TX.punct_ratio(t), 4).alias("punct_ratio"),
        F.round(TX.mean_token_length(t), 4).alias("mean_token_len"),
    )


# --------------------------------------------------------------------------
# Language-ID heuristic (marker-vocabulary argmax)
# --------------------------------------------------------------------------
@register(
    "lang_id_heuristic",
    doc="Language-ID heuristic: marker-vocabulary hit counts, argmax with "
    "deterministic tie-break (first vocabulary wins ties)",
    tags=("text", "expression"),
    oracle="""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents
),
hits AS (
    SELECT doc_id,
           len(list_filter(tk, t -> t IN ('the','a','value','fast','slow'))) AS h_en,
           len(list_filter(tk, t -> t IN ('query','join','table','scan','agg'))) AS h_sql,
           len(list_filter(tk, t -> t IN ('batch','stream','merge','window','spark'))) AS h_ops
    FROM toks
)
SELECT doc_id,
       CASE WHEN h_en >= h_sql AND h_en >= h_ops THEN 'en'
            WHEN h_sql >= h_ops THEN 'sql'
            ELSE 'ops' END AS predicted_lang,
       h_en, h_sql, h_ops
FROM hits
""",
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    hits = docs.select(
        "doc_id",
        TX.marker_hits(t, TX.LANG_MARKERS["en"]).alias("h_en"),
        TX.marker_hits(t, TX.LANG_MARKERS["sql"]).alias("h_sql"),
        TX.marker_hits(t, TX.LANG_MARKERS["ops"]).alias("h_ops"),
    )
    predicted = (
        F.when(
            (F.col("h_en") >= F.col("h_sql")) & (F.col("h_en") >= F.col("h_ops")),
            F.lit("en"),
        )
        .when(F.col("h_sql") >= F.col("h_ops"), F.lit("sql"))
        .otherwise(F.lit("ops"))
    )
    return hits.select(
        "doc_id", predicted.alias("predicted_lang"), "h_en", "h_sql", "h_ops"
    )


# --------------------------------------------------------------------------
# Exact dedup via normalized fingerprint
# --------------------------------------------------------------------------
@register(
    "dedup_exact_fingerprint",
    doc="Exact dedup: md5 fingerprint of case/whitespace-normalized text, "
    "hash-groupBy -> canonical id (min) + duplicate count; the groupBy "
    "partial-aggregates map-side so only one row per fingerprint shuffles",
    tags=("text", "dedup", "aggregate"),
    oracle="""
SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1
""",
)
def dedup_exact_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(TX.fingerprint(F.col("text")).alias("fingerprint")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# --------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish subword regex)
# --------------------------------------------------------------------------
@register(
    "token_counting",
    doc="Token counting: whitespace tokens and a BPE-ish subword unit count "
    "(non-overlapping 1-4 char alpha chunks) per doc + corpus totals shape",
    tags=("text", "expression"),
    oracle="""
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-z]{1,4}')) AS n_subword_units
FROM documents
""",
)
def token_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]{1,4}")).alias("n_subword_units"),
    )


# --------------------------------------------------------------------------
# Brute-force cosine top-k (similarity-search baseline)
# --------------------------------------------------------------------------
@register(
    "knn_brute_cosine",
    doc=f"ANN baseline: brute-force cosine top-{KNN_K} for {KNN_N_QUERIES} "
    "query vectors; fixed-point integer dot products (exact, order-"
    "independent) so Spark and the oracle agree bit-for-bit",
    tags=("vector", "join", "window"),
    oracle=f"""
WITH iv AS (
    SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings
),
n AS (
    SELECT vec_id, q, list_dot_product(q, q) AS nsq FROM iv
),
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROUND(list_dot_product(a.q, b.q) / sqrt(a.nsq) / sqrt(b.nsq), 6) AS cosine
    FROM n a JOIN n b ON b.vec_id <> a.vec_id
    WHERE a.vec_id < {KNN_N_QUERIES}
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {KNN_K}
""",
)
def knn_brute_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.quantize(F.col("embedding")).alias("q")
    )
    emb = emb.withColumn("nsq", VX.int_norm_sq(F.col("q")))
    queries = (
        emb.filter(F.col("vec_id") < KNN_N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qv"),
            F.col("nsq").alias("qn"),
        )
    )
    # broadcast the tiny query side; candidates stream through
    scored = emb.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            VX.cosine_from_int(
                VX.int_dot(F.col("qv"), F.col("q")), F.col("qn"), F.col("nsq")
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# Embedding near-dup pairs (cosine threshold)
# --------------------------------------------------------------------------
@register(
    "embedding_near_dup_pairs",
    doc=f"Embedding near-dup: unordered pairs with cosine >= {NEAR_DUP_COSINE}. "
    "Brute baseline scored by BLOCK-PARTITIONED exact int64 matmul "
    "(functions/vectors.py::matmul_near_dup_pairs): blocks packed via "
    "collect_list, unordered block pairs formed by equi-joins against "
    "a metadata pair-key frame, numpy matmul per pair inside "
    "mapInPandas — fully distributed, no driver collect, memory/task "
    "= 2 blocks (tunable via num_blocks). Bit-identical to the HOF "
    "dot-product form at ~20x the throughput; the O(N^2) compute of "
    "the brute baseline is inherent — the LSH-bucketed scale path is "
    "ann_lsh_bucketed",
    tags=("vector", "join", "dedup"),
    oracle=f"""
WITH iv AS (
    SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings
),
n AS (
    SELECT vec_id, q, list_dot_product(q, q) AS nsq FROM iv
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.q, b.q) / sqrt(a.nsq) / sqrt(b.nsq), 6) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.q, b.q) / sqrt(a.nsq) / sqrt(b.nsq) >= {NEAR_DUP_COSINE}
""",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.quantize(F.col("embedding")).alias("q")
    )
    pairs = VX.matmul_near_dup_pairs(emb, NEAR_DUP_COSINE)
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine")
    )


# --------------------------------------------------------------------------
# Composed corpus-cleaning pass (lang gate -> quality gate -> dedup)
# --------------------------------------------------------------------------
@register(
    "corpus_cleaning_audit",
    doc="Corpus cleaning as ONE declarative pass: language gate "
    "(marker argmax = 'en'), quality gate (minimum token count), "
    "classifier gate (the hashed-ngram linear scorer of "
    "quality_classifier_scores, folded in as its EXACT integer form — "
    "prob >= 0.5 is wsum >= 100*n_features, so the gate costs one "
    "scan-side HOF and no floating point), prefix-fingerprint dedup "
    "gate (md5 of the first 3 tokens — the cheap near-dup "
    "canonicalizer; non-canonical rows dropped) — every doc labeled "
    "kept/dropped with its FIRST failing gate; one scan + one window "
    "over the fingerprint. The audit-trail shape a 100 TB cleaning "
    "job persists: heuristics, then classifier, then dedup, the CCNet "
    "stage order.",
    tags=("text", "pipeline", "classifier", "training-data"),
    oracle=f"""
WITH scored AS (
    SELECT doc_id, text,
           string_split_regex(trim(text), '\\s+') AS tk,
           md5(array_to_string(string_split_regex(trim(text), '\\s+')[1:3], ' ')) AS fp
    FROM documents
),
gates AS (
    SELECT doc_id, fp,
           len(list_filter(tk, t -> t IN ('the','a','value','fast','slow'))) AS h_en,
           len(list_filter(tk, t -> t IN ('query','join','table','scan','agg'))) AS h_sql,
           len(list_filter(tk, t -> t IN ('batch','stream','merge','window','spark'))) AS h_ops,
           len(tk) AS n_tokens,
           {TX.DUCK_NGRAM_WSUM.format(t='tk')} AS wsum
    FROM scored
),
canon AS (
    SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS canonical_id FROM gates
)
SELECT doc_id,
       CASE WHEN NOT (h_en >= h_sql AND h_en >= h_ops) THEN 'dropped:lang'
            WHEN n_tokens < 30 THEN 'dropped:quality'
            WHEN wsum < 100 * (2 * n_tokens - 1) THEN 'dropped:classifier'
            WHEN doc_id <> canonical_id THEN 'dropped:duplicate'
            ELSE 'kept' END AS status
FROM canon
""",
)
def corpus_cleaning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-doc gate scores + verdict come from the SHARED helpers
    # (functions/text.py) also consumed by the incremental ingest tick
    # — one definition of the lang/quality/classifier expressions
    # (advisor r10). prob >= 0.5 <=> wsum >= 100 * n_features with
    # n_features = 2*n_tokens - 1 — exact integers, no EXP in the gate.
    docs = load_table(spark, sf_dir, "documents")
    gates = TX.cleaning_gate_frame(docs, fast=False)
    canonical = F.min("doc_id").over(Window.partitionBy("fp"))
    verdict = TX.cleaning_gate_verdict()
    status = (
        F.when(verdict != "pass", verdict)
        .when(F.col("doc_id") != canonical, F.lit("dropped:duplicate"))
        .otherwise(F.lit("kept"))
    )
    return gates.select("doc_id", status.alias("status"))


@register(
    "corpus_cleaning_audit_fast",
    doc="The corpus_cleaning_audit composition gated on the xxhash64 "
    "classifier twin (hashed_ngram_weight_sum_fast) — the PRODUCTION "
    "form of the audit: same lang gate, quality gate, gate order, "
    "prefix-fingerprint dedup and audit-trail shape, but the "
    "classifier stage stops paying the md5 oracle-portability tax "
    "the md5 audit documents. Rows-only check (DuckDB cannot replay "
    "XXH64); the md5 audit stays registered as the hash-matched "
    "baseline, and the invariant pytest pins that the two audits "
    "agree on every gate EXCEPT where the classifier verdict itself "
    "differs (lang/quality drops identical; a doc only moves between "
    "kept / dropped:classifier / dropped:duplicate).",
    tags=("text", "pipeline", "classifier", "training-data", "fast-twin"),
    oracle=None,
)
def corpus_cleaning_audit_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared gate helpers (functions/text.py) with the xxhash64
    # classifier — the exact expressions streaming/corpus_tick.py runs
    docs = load_table(spark, sf_dir, "documents")
    gates = TX.cleaning_gate_frame(docs, fast=True)
    canonical = F.min("doc_id").over(Window.partitionBy("fp"))
    verdict = TX.cleaning_gate_verdict()
    status = (
        F.when(verdict != "pass", verdict)
        .when(F.col("doc_id") != canonical, F.lit("dropped:duplicate"))
        .otherwise(F.lit("kept"))
    )
    return gates.select("doc_id", status.alias("status"))


# --------------------------------------------------------------------------
# Duplicate clusters: pairs -> connected components -> canonical pick
# --------------------------------------------------------------------------
@register(
    "dedup_duplicate_clusters",
    doc="The clustering step between 'near-dup pairs' and 'keep one doc "
    "per group': connected components (iterative min-label propagation, "
    "operators/components.py) over the embedding near-dup pairs, then a "
    "deterministic canonical pick (min id per component). Oracle computes "
    "the same components via DuckDB's recursive transitive closure.",
    tags=("vector", "dedup", "iterative", "training-data"),
    oracle=f"""
WITH RECURSIVE iv AS (
    SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings
),
n AS (
    SELECT vec_id, q, list_dot_product(q, q) AS nsq FROM iv
),
pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.q, b.q) / sqrt(a.nsq) / sqrt(b.nsq)
          >= {NEAR_DUP_COSINE}
),
edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION
    SELECT id_b AS a, id_a AS b FROM pairs
),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
),
comp AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node)
SELECT node, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS INT) AS cluster_size,
       CAST(node = cluster_id AS INT) AS is_canonical
FROM comp
""",
)
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.components import duplicate_clusters

    pairs = embedding_near_dup_pairs(spark, sf_dir).select("id_a", "id_b")
    return duplicate_clusters(pairs)


KNN_BASE_SPLIT = 400  # vec_id < SPLIT = base corpus; >= SPLIT = delta batch


@register(
    "knn_incremental_update",
    doc=f"Incremental top-{KNN_K} maintenance under insert-only growth "
    "(the interactive-session top-k pattern): the base corpus's top-k "
    "is reused as-is and only the delta batch is scored "
    f"(vec_id >= {KNN_BASE_SPLIT}), then the union re-ranks — work per "
    "refresh is O(queries x delta), never a rescan of the base. The "
    "oracle recomputes top-k over the FULL corpus directly, proving "
    "the incremental path exactly equals the from-scratch answer.",
    tags=("vector", "window", "incremental"),
    oracle=f"""
WITH iv AS (
    SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings
),
n AS (
    SELECT vec_id, q, list_dot_product(q, q) AS nsq FROM iv
),
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROUND(list_dot_product(a.q, b.q) / sqrt(a.nsq) / sqrt(b.nsq), 6) AS cosine
    FROM n a JOIN n b ON b.vec_id <> a.vec_id
    WHERE a.vec_id < {KNN_N_QUERIES}
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {KNN_K}
""",
)
def knn_incremental_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.quantize(F.col("embedding")).alias("q")
    )
    emb = emb.withColumn("nsq", VX.int_norm_sq(F.col("q")))
    queries = emb.filter(F.col("vec_id") < KNN_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("nsq").alias("qn"),
    )

    def scores(cands: DataFrame) -> DataFrame:
        return cands.join(
            F.broadcast(queries), F.col("vec_id") != F.col("query_id")
        ).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                VX.cosine_from_int(
                    VX.int_dot(F.col("qv"), F.col("q")),
                    F.col("qn"),
                    F.col("nsq"),
                ),
                6,
            ).alias("cosine"),
        )

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    # maintained state: top-k over the base corpus, PERSISTED (r14 —
    # the same staged-state read as the media/LSH incremental family;
    # doubles round-trip parquet exactly, so hashes are untouched)
    from falcon_metrics_etl_spark.session import staged_index

    # key embeds the governing constants (r15 advisor, low #3)
    base_topk = staged_index(
        spark,
        f"knn_base_topk:k={KNN_K}:split={KNN_BASE_SPLIT}:{sf_dir}",
        lambda: scores(emb.filter(F.col("vec_id") < KNN_BASE_SPLIT))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .drop("rank"),
        src_dir=sf_dir,
    )
    # refresh: score ONLY the delta, merge with retained state, re-rank
    delta_scores = scores(emb.filter(F.col("vec_id") >= KNN_BASE_SPLIT))
    return (
        base_topk.unionByName(delta_scores)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# Shared DuckDB tail of the keep-best selection: expects a ``pairs``
# CTE of (id_a, id_b) — the pair SOURCE is the parameter, the
# cluster/keep logic is identical across sources.
_DUCK_KEEP_BEST_TAIL = """
edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION
    SELECT id_b AS a, id_a AS b FROM pairs
),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
),
comp AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
ranked AS (
    SELECT c.cluster_id, c.node, d.n_chars,
           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY d.n_chars DESC, c.node) AS rk
    FROM comp c JOIN documents d ON d.doc_id = c.node
)
SELECT cluster_id,
       MAX(CASE WHEN rk = 1 THEN node END) AS kept_doc,
       MAX(CASE WHEN rk = 1 THEN n_chars END) AS kept_chars,
       CAST(COUNT(*) AS INT) AS n_members,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN rk > 1 THEN n_chars ELSE 0 END) AS BIGINT)
           AS pruned_chars
FROM ranked
GROUP BY cluster_id
"""


def _keep_best_from_pairs(
    spark: SparkSession, sf_dir: str, pairs: DataFrame
) -> DataFrame:
    """Per-cluster canonical selection over any (id_a, id_b) pair source.

    pairs -> connected components (min-label propagation) -> join doc
    stats -> one row_number window per cluster. comp is bounded by the
    CLUSTERED node count (a small fraction of the corpus), so the join
    against fact-sized ``documents`` carries no hint: AQE broadcasts
    the comp side when it is small and falls back to a doc_id-keyed
    shuffle join otherwise — never a forced fact-table broadcast.
    """
    from falcon_metrics_etl_spark.operators.components import duplicate_clusters

    comp = duplicate_clusters(pairs).select("node", "cluster_id")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node"), "n_chars"
    )
    ranked = comp.join(docs, "node").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                F.col("n_chars").desc(), "node"
            )
        ),
    )
    return ranked.groupBy("cluster_id").agg(
        F.max(F.when(F.col("rk") == 1, F.col("node"))).alias("kept_doc"),
        F.max(F.when(F.col("rk") == 1, F.col("n_chars"))).alias("kept_chars"),
        F.count(F.lit(1)).cast("int").alias("n_members"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.when(F.col("rk") > 1, F.col("n_chars")).otherwise(F.lit(0)))
        .cast("long")
        .alias("pruned_chars"),
    )


@register(
    "dedup_keep_best",
    doc="LABELED O(N^2) BASELINE — oracle-parity role only, NOT the "
    "scale path (same framing as embedding_near_dup_pairs, whose "
    "exact all-pairs output this registration deliberately consumes "
    "so the keep-best selector can be verified against an "
    "unapproximated pair set). The selector itself is scale-safe "
    "(1 shuffle, AQE-chosen broadcast); the quadratic upstream is the "
    "point of this twin. Production composition = dedup_keep_best_lsh "
    "(identical selector over MinHash-LSH banded pairs). The decision "
    "rule: per near-dup cluster keep the BEST document (longest text, "
    "ties to the lowest id) and report what pruning drops.",
    tags=("dedup", "iterative", "window", "training-data"),
    oracle=f"""
WITH RECURSIVE iv AS (
    SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings
),
n AS (
    SELECT vec_id, q, list_dot_product(q, q) AS nsq FROM iv
),
pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.q, b.q) / sqrt(a.nsq) / sqrt(b.nsq)
          >= {NEAR_DUP_COSINE}
),{_DUCK_KEEP_BEST_TAIL}""",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = embedding_near_dup_pairs(spark, sf_dir).select("id_a", "id_b")
    return _keep_best_from_pairs(spark, sf_dir, pairs)


@register(
    "dedup_keep_best_lsh",
    doc="keep-best canonical selection fed by MinHash+LSH banded "
    "candidate pairs — the 100 TB composition: banded bucket-join pair "
    "generation (no cross product), O(diameter) min-label components, "
    "doc_id-keyed stats join (no forced broadcast), one window per "
    "cluster. Same selector as dedup_keep_best, scale-safe upstream.",
    tags=("dedup", "lsh", "iterative", "window", "training-data"),
    oracle=f"""
WITH RECURSIVE {DUCK_LSH_PAIR_CTES},
pairs AS (SELECT id_a, id_b FROM lsh_pairs),{_DUCK_KEEP_BEST_TAIL}""",
)
def dedup_keep_best_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.plans.dedup_lsh import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    return _keep_best_from_pairs(spark, sf_dir, pairs)


# --------------------------------------------------------------------------
# Exact substring-level dedup (repeated-passage detection)
# --------------------------------------------------------------------------
SUBSTR_W = 8  # token window length


@register(
    "substring_dedup_windows",
    doc=f"Exact substring-level dedup signal (the 'deduplicating "
    f"training data' repeated-passage detector): every {SUBSTR_W}-token "
    "sliding window (stride 1 — arbitrary offsets, unlike the "
    "non-overlapping chunks of chunk_dedup_rebuild) is ranked globally "
    "by first occurrence (doc_id, pos); later occurrences are "
    "duplicated passage. Output: per-doc window counts + duplication "
    "ratio. Plan (scale-safe, registered): windows are keyed by a "
    "128-bit hash (xxhash64 pair), and the global first occurrence per "
    "window is computed as min(struct(doc_id, pos)) in a hash "
    "AGGREGATE, not a row_number sort-window — partial aggregation "
    "collapses ultra-hot boilerplate windows map-side, so no skewed "
    "key ever fully shuffles (structurally stronger than a df-cap "
    "salt). Per-doc totals come straight from size(tk)-W+1 with no "
    "explode; n_dup = n_windows - n_firsts. 3 shuffles, all "
    "partial-aggregated or doc-keyed; collision odds at 128 bits are "
    "negligible at corpus scale (~2^-128 per pair).",
    tags=("text", "dedup", "window", "training-data"),
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {TX.DUCK_TOKENS.format(x='text')} AS tk FROM documents
),
wins AS (
    SELECT doc_id, i AS pos,
           array_to_string(tk[i+1:i+{SUBSTR_W}], ' ') AS win
    FROM (SELECT doc_id, tk, unnest(range(0, len(tk) - {SUBSTR_W - 1})) AS i
          FROM toks WHERE len(tk) >= {SUBSTR_W})
),
ranked AS (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
    FROM wins
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_windows,
       ROUND(CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_ratio
FROM ranked
GROUP BY doc_id
""",
)
def substring_dedup_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = SUBSTR_W
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("tk")).filter(
        F.size("tk") >= w
    )
    # per-doc totals need no explode at all: a doc with n tokens has
    # exactly n-W+1 stride-1 windows
    totals = toks.select(
        "doc_id", (F.size("tk") - F.lit(w - 1)).cast("long").alias("n_windows")
    )
    # windows via a pure HOF: transform over the start-index sequence,
    # slice + join — stays in codegen, one row per window after the
    # single posexplode; the raw window text is immediately reduced to
    # a 128-bit key (two independent xxhash64 seeds) so the shuffle
    # never carries strings
    wins = TX.substring_window_hashes(docs, w)
    # global first occurrence per window = min(struct(doc_id, pos)) —
    # the same (doc_id, pos) lexicographic order as the oracle's
    # ROW_NUMBER ... ORDER BY doc_id, pos. A hash aggregate partial-
    # aggregates map-side, so a boilerplate window repeated 10^9 times
    # shuffles ~one row per input partition, not 10^9 rows: the skewed
    # key cannot reach a single reducer unreduced.
    firsts_per_doc = (
        wins.groupBy("h1", "h2")
        .agg(F.min(F.struct("doc_id", "pos")).alias("first"))
        .groupBy(F.col("first.doc_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_first"))
    )
    n_dup = F.col("n_windows") - F.coalesce(F.col("n_first"), F.lit(0))
    return totals.join(firsts_per_doc, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        n_dup.alias("n_dup_windows"),
        F.round(n_dup.cast("double") / F.col("n_windows"), 6).alias("dup_ratio"),
    )


@register(
    "substring_dedup_spans",
    doc=f"Maximal duplicated SPANS — the operational half of "
    "substring-level dedup: a scrubber needs span boundaries, not "
    f"per-window flags. Consecutive duplicated {SUBSTR_W}-token "
    "windows (stride 1) merge into maximal spans via gaps-and-islands "
    "(pos - row_number per doc); a span over window positions [s, e] "
    f"covers tokens [s, e+{SUBSTR_W}-1]. Output: per-doc span count, "
    "longest span, covered-token total (docs with at least one "
    "duplicated window). Plan: the same min(struct) hash aggregate as "
    "substring_dedup_windows computes global first occurrences "
    "(map-side partial agg kills boilerplate skew), then an N:1 join "
    "back on the 128-bit window hash flags duplicate occurrences "
    "(AQE skew-join splits a hot probe side; the build side is one "
    "row per distinct window), and one doc-keyed window pass forms "
    "the islands. No raw window text ever shuffles.",
    tags=("text", "dedup", "window", "training-data"),
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {TX.DUCK_TOKENS.format(x='text')} AS tk FROM documents
),
wins AS (
    SELECT doc_id, i AS pos,
           array_to_string(tk[i+1:i+{SUBSTR_W}], ' ') AS win
    FROM (SELECT doc_id, tk, unnest(range(0, len(tk) - {SUBSTR_W - 1})) AS i
          FROM toks WHERE len(tk) >= {SUBSTR_W})
),
ranked AS (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
    FROM wins
),
dups AS (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM ranked WHERE rn > 1
),
spans AS (
    SELECT doc_id, MIN(pos) AS s, MAX(pos) AS e
    FROM dups GROUP BY doc_id, grp
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(MAX(e - s + {SUBSTR_W}) AS BIGINT) AS longest_span_tokens,
       CAST(SUM(e - s + {SUBSTR_W}) AS BIGINT) AS covered_tokens
FROM spans
GROUP BY doc_id
""",
)
def substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = SUBSTR_W
    wins = TX.substring_window_hashes(docs, w)
    firsts = wins.groupBy("h1", "h2").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    # N:1 equi-join on the hash key flags every non-first occurrence;
    # identical tie-break as the oracle's rn>1 (min struct order)
    dups = (
        wins.join(firsts, ["h1", "h2"])
        .filter(
            (F.col("first.doc_id") != F.col("doc_id"))
            | (F.col("first.pos") != F.col("pos"))
        )
        .select("doc_id", "pos")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        dups.withColumn("grp", F.col("pos") - F.row_number().over(wd))
        .groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("s"), F.max("pos").alias("e"))
    )
    span_len = F.col("e") - F.col("s") + F.lit(w)
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max(span_len).alias("longest_span_tokens"),
        F.sum(span_len).alias("covered_tokens"),
    )


@register(
    "substring_dedup_scrub",
    doc=f"The end-to-end substring scrubber: rebuild every document "
    "with its duplicated spans REMOVED (first occurrences kept — "
    "later copies of a passage are cut, the 'deduplicating training "
    "data' rewrite). Spans come from the same hash-aggregate + "
    "islands pipeline as substring_dedup_spans; the rebuild is a pure "
    f"JVM HOF — F.filter's (token, index) lambda drops tokens inside "
    "any covered span (spans per doc are few, so the exists() probe "
    "is O(spans) per token, no explode). Docs with no duplicated "
    f"spans (including docs shorter than {SUBSTR_W} tokens) pass "
    "through with all tokens kept. Output: doc_id, kept-token count, "
    "the cleaned text itself (hash-compared against the oracle's "
    "ordered string_agg rebuild).",
    tags=("text", "dedup", "window", "training-data", "rewrite"),
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {TX.DUCK_TOKENS.format(x='text')} AS tk FROM documents
),
wins AS (
    SELECT doc_id, i AS pos,
           array_to_string(tk[i+1:i+{SUBSTR_W}], ' ') AS win
    FROM (SELECT doc_id, tk, unnest(range(0, len(tk) - {SUBSTR_W - 1})) AS i
          FROM toks WHERE len(tk) >= {SUBSTR_W})
),
ranked AS (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
    FROM wins
),
dups AS (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM ranked WHERE rn > 1
),
spans AS (
    SELECT doc_id, MIN(pos) AS s, MAX(pos) AS e
    FROM dups GROUP BY doc_id, grp
),
covered AS (
    SELECT doc_id, unnest(range(s, e + {SUBSTR_W})) AS i FROM spans
),
tok_idx AS (
    SELECT doc_id, i, tk[i + 1] AS t
    FROM (SELECT doc_id, tk, unnest(range(0, len(tk))) AS i FROM toks)
),
kept AS (
    SELECT k.doc_id,
           COUNT(*) AS n_tokens_kept,
           string_agg(k.t, ' ' ORDER BY k.i) AS clean_text
    FROM tok_idx k
    LEFT JOIN covered c ON c.doc_id = k.doc_id AND c.i = k.i
    WHERE c.i IS NULL
    GROUP BY k.doc_id
)
SELECT t.doc_id,
       CAST(COALESCE(kept.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
       COALESCE(kept.clean_text, '') AS clean_text
FROM toks t LEFT JOIN kept ON kept.doc_id = t.doc_id
""",
)
def substring_dedup_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = SUBSTR_W
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("tk"))
    wins = TX.substring_window_hashes(docs, w)
    firsts = wins.groupBy("h1", "h2").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    dups = (
        wins.join(firsts, ["h1", "h2"])
        .filter(
            (F.col("first.doc_id") != F.col("doc_id"))
            | (F.col("first.pos") != F.col("pos"))
        )
        .select("doc_id", "pos")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        dups.withColumn("grp", F.col("pos") - F.row_number().over(wd))
        .groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("s"), (F.max("pos") + w - 1).alias("e_tok"))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e_tok")).alias("spans"))
    )
    joined = toks.join(spans, "doc_id", "left").withColumn(
        "spans", F.coalesce(F.col("spans"), F.array())
    )
    kept = F.filter(
        F.col("tk"),
        lambda t, i: ~F.exists(
            F.col("spans"),
            lambda sp: (i >= sp["s"]) & (i <= sp["e_tok"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.size(kept).cast("long").alias("n_tokens_kept"),
        F.array_join(kept, " ").alias("clean_text"),
    )


SUBSTR_DELTA_MOD = 17  # same delta convention as minhash_incremental_update


@register(
    "substring_incremental_flags",
    doc=f"Incremental substring-dedup — the per-ingest-batch shape: "
    f"arriving documents (doc_id % {SUBSTR_DELTA_MOD} == 0 plays the "
    "delta) have their windows probed against the BASE corpus's "
    "window-hash index, flagging how much of each new document is "
    "already-seen passage BEFORE it enters the corpus (the admission "
    "filter a 100 TB pipeline runs on every batch). Plan: base "
    "windows reduce to one row per distinct 128-bit hash via a "
    "partial-aggregated groupBy (in production this index is "
    "PERSISTED and maintained, as with the MinHash band index; here "
    "both sides derive from the same table but keep the delta-probe "
    "shape), delta windows left-SEMI-join the index — delta-sized "
    "probe, never base-x-base work. Output: per delta doc, window "
    "count, already-in-base count, overlap ratio.",
    tags=("text", "dedup", "window", "training-data", "incremental"),
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {TX.DUCK_TOKENS.format(x='text')} AS tk FROM documents
),
wins AS (
    SELECT doc_id, i AS pos,
           array_to_string(tk[i+1:i+{SUBSTR_W}], ' ') AS win
    FROM (SELECT doc_id, tk, unnest(range(0, len(tk) - {SUBSTR_W - 1})) AS i
          FROM toks WHERE len(tk) >= {SUBSTR_W})
),
base_idx AS (
    SELECT DISTINCT win FROM wins WHERE doc_id % {SUBSTR_DELTA_MOD} <> 0
),
delta AS (
    SELECT doc_id, pos, win FROM wins WHERE doc_id % {SUBSTR_DELTA_MOD} = 0
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN b.win IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_seen_in_base,
       ROUND(CAST(SUM(CASE WHEN b.win IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS seen_ratio
FROM delta d LEFT JOIN base_idx b ON b.win = d.win
GROUP BY d.doc_id
""",
)
def substring_incremental_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = SUBSTR_W
    wins = TX.substring_window_hashes(docs, w)
    is_delta = F.col("doc_id") % SUBSTR_DELTA_MOD == 0
    base_idx = (
        wins.filter(~is_delta).groupBy("h1", "h2").agg(F.lit(1).alias("_one"))
    )
    delta = wins.filter(is_delta)
    seen = (
        delta.join(base_idx, ["h1", "h2"], "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_seen_in_base"))
    )
    totals = delta.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_windows"))
    n_seen = F.coalesce(F.col("n_seen_in_base"), F.lit(0))
    return totals.join(seen, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        n_seen.alias("n_seen_in_base"),
        F.round(n_seen.cast("double") / F.col("n_windows"), 6).alias(
            "seen_ratio"
        ),
    )
