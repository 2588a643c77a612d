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
from falcon_metrics_etl_spark.session import perf_checkpoint
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


@register(
    "sampled_lead_time_p85",
    doc="Quantile-by-sampling sketch (operators/sampling.py::"
    "sampled_percentile_disc): p85 lead time per class of service from "
    "a deterministic 1/4 hash sample of orders — the scale path when "
    "exact per-group percentiles would sort the world; exactly "
    "reproducible cross-engine, unlike t-digest/KLL",
    tags=("sketch", "percentile", "sampling"),
    oracle="""
WITH sampled AS (
    SELECT o_orderpriority AS class_of_service,
           datediff('day', CAST(o_orderdate AS DATE),
                    CAST(l.l_shipdate AS DATE)) AS lead_days,
           CAST(o.o_orderkey AS VARCHAR) AS k
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT class_of_service,
       CAST(percentile_disc(0.85) WITHIN GROUP (ORDER BY lead_days)
            AS BIGINT) AS p85
FROM sampled
WHERE (('0x' || substring(md5(k), 1, 15))::BIGINT) % 4 = 0
GROUP BY class_of_service
""",
)
def sampled_lead_time_p85(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.sampling import (
        sampled_percentile_disc,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("class_of_service"),
        F.to_date("o_orderdate").alias("commit_day"),
        F.col("o_orderkey").cast("string").alias("k"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship_day")
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "class_of_service",
        F.datediff("ship_day", "commit_day").alias("lead_days"),
        "k",
    )
    out = sampled_percentile_disc(
        joined, ["class_of_service"], "lead_days", "k", 0.85, keep_mod=4
    )
    return out.select(
        "class_of_service", F.col("p85").cast("long").alias("p85")
    )


MIX_TOKEN_BUDGET = 40000

# r16 (guide §2.5): range buckets on the 60-bit hash for the greedy-
# prefix selection — the old shape ran ONE cumsum window task per
# source over the source's ENTIRE doc set; bucketing by the hash's
# top 8 bits classifies all but one bucket per source with bucket
# AGGREGATES, and only the single budget-straddling bucket's rows
# (~1/256 of the source) pay the row-level cumsum.
_MIX_PREFIX_BUCKETS_SHIFT = 52  # 60-bit hash >> 52 -> 256 buckets

# The two-phase form reads the corpus twice, so below this estimated
# input size (plan statistics — no job) the one-window form is
# strictly cheaper: the per-source sort fits one task comfortably and
# the second read is pure cost (quiet A/B at sf0.1: two-phase 2.2x on
# a 0.4 s scan-dominated entry). Parameterised per the optimization
# guide's scale-adaptive rule; the 256 MiB local default keeps the
# bench comparable while any real corpus shard flips to two-phase.
# tests/test_sampling.py pins both paths row-identical by forcing the
# threshold to 0.
_MIX_TWO_PHASE_MIN_BYTES_CONF = "spark.falconMetricsEtl.mixTwoPhaseMinBytes"
_MIX_TWO_PHASE_MIN_BYTES_DEFAULT = str(256 * 1024 * 1024)


def _greedy_prefix_stats(base: DataFrame, n_tokens_col) -> DataFrame:
    """Per-source greedy hash-prefix selection aggregates, two-phase.

    Input: ``base`` carries (doc_id, source, h, budget, + whatever
    ``n_tokens_col`` reads, e.g. text) with ``budget`` constant per
    source; ``n_tokens_col`` is the token-count EXPRESSION, attached
    separately per pass so the boundary re-read only tokenizes the
    rows it keeps. Replaces the per-source corpus-wide running
    cumsum window (``SUM(n_tokens) OVER (PARTITION BY source ORDER BY
    h, doc_id)``) with: (1) per-(source, h-range-bucket) token/doc
    totals — one map-side-combined shuffle of <=256 rows per source;
    (2) a tiny per-source window over those bucket rows classifies
    each bucket as fully-selected (prefix + total <= budget), fully
    rejected (prefix > budget), or THE budget-straddling boundary
    bucket; (3) only boundary-bucket rows (one bucket per source)
    re-scan into the exact row-level cumsum, offset by the bucket
    prefix — the broadcast bucket join runs BEFORE the token count,
    so the second pass tokenizes ~1/256 of the corpus. Global cumsum
    = bucket prefix + within-bucket cumsum (range buckets preserve
    the (h, doc_id) order; pure long arithmetic), so every row's
    selected/rejected verdict is bit-identical to the one-window
    form. Costs one extra corpus read — the 100 TB trade is one
    straggler task per source versus a parallel scan.

    Below the configured input-size threshold the exact one-window
    form runs instead (identical output — pinned by pytest forcing
    the threshold to 0): at bench scale the window's per-source sort
    is comfortably one task and the boundary re-read is pure cost.

    INVARIANT: the bucket-total decomposition equals the one-window
    cumsum only for NON-NEGATIVE, NON-NULL token counts (a negative
    count breaks cumsum monotonicity, and an all-NULL bucket total
    would silently vanish from both the full and boundary sets) —
    so the token expression is clamped to ``greatest(0, coalesce(n,
    0))`` on BOTH paths (r16 advisor: ``size(tokens(NULL))`` is NULL
    or -1 depending on the legacy sizeOfNull setting).

    Output: (source, token_budget, n_selected, tokens_selected,
    n_docs, tokens_available)."""
    from pyspark.sql import Window

    from falcon_metrics_etl_spark.session import scale_gate

    n_tokens_col = F.greatest(
        F.lit(0).cast("long"),
        F.coalesce(n_tokens_col.cast("long"), F.lit(0).cast("long")),
    )
    # gate centralised in session.scale_gate (r16 advisor: the stats
    # probe is a private API — an unavailable estimate must degrade to
    # the scale-safe two-phase path, not raise)
    if not scale_gate(
        base,
        _MIX_TWO_PHASE_MIN_BYTES_CONF,
        int(_MIX_TWO_PHASE_MIN_BYTES_DEFAULT),
    ):
        cw = base.withColumn("n_tokens", n_tokens_col)
        wcum = (
            Window.partitionBy("source")
            .orderBy("h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        c = cw.withColumn("cum", F.sum("n_tokens").over(wcum))
        sel = F.col("cum") <= F.col("budget")
        return c.groupBy("source").agg(
            F.any_value(F.col("budget")).alias("token_budget"),
            F.sum(sel.cast("int")).cast("long").alias("n_selected"),
            F.sum(F.when(sel, F.col("n_tokens")).otherwise(F.lit(0)))
            .cast("long")
            .alias("tokens_selected"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens_available"),
        )

    bb = base.withColumn(
        "__b", F.shiftright(F.col("h"), _MIX_PREFIX_BUCKETS_SHIFT)
    )
    cb = bb.withColumn("n_tokens", n_tokens_col)
    bstats = cb.groupBy("source", "__b").agg(
        F.sum("n_tokens").alias("__bt"),
        F.count(F.lit(1)).alias("__nd"),
        F.any_value(F.col("budget")).alias("budget"),
    )
    wpre = (
        Window.partitionBy("source")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # lazy checkpoint: the bucket frame (<= 256 rows per source) is
    # consumed by the coarse rollup AND the boundary probe — without
    # it each consumer re-derives the corpus aggregation
    bpre = perf_checkpoint(
        bstats.withColumn(
            "__pre",
            F.coalesce(F.sum("__bt").over(wpre), F.lit(0).cast("long")),
        )
    )
    full = (F.col("__pre") + F.col("__bt")) <= F.col("budget")
    none = F.col("__pre") > F.col("budget")
    coarse = bpre.groupBy("source").agg(
        F.any_value(F.col("budget")).alias("token_budget"),
        F.sum(F.when(full, F.col("__nd")).otherwise(F.lit(0)))
        .alias("__sel_docs_full"),
        F.sum(F.when(full, F.col("__bt")).otherwise(F.lit(0)))
        .alias("__sel_tok_full"),
        F.sum("__nd").alias("n_docs"),
        F.sum("__bt").alias("tokens_available"),
    )
    boundary = bpre.filter(~full & ~none).select("source", "__b", "__pre")
    wcum = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the broadcast bucket join prunes to ~1/256 of the rows BEFORE
    # the token count attaches — the boundary re-read pays I/O, not
    # a second full tokenize
    fine = (
        bb.join(F.broadcast(boundary), ["source", "__b"])
        .withColumn("n_tokens", n_tokens_col)
        .withColumn(
            "__cum", F.col("__pre") + F.sum("n_tokens").over(wcum)
        )
    )
    fsel = F.col("__cum") <= F.col("budget")
    fine_agg = fine.groupBy("source").agg(
        F.sum(fsel.cast("int")).alias("__sel_docs_fine"),
        F.sum(F.when(fsel, F.col("n_tokens")).otherwise(F.lit(0)))
        .alias("__sel_tok_fine"),
    )
    return coarse.join(fine_agg, "source", "left").select(
        "source",
        "token_budget",
        (
            F.col("__sel_docs_full")
            + F.coalesce(F.col("__sel_docs_fine"), F.lit(0))
        ).cast("long").alias("n_selected"),
        (
            F.col("__sel_tok_full")
            + F.coalesce(F.col("__sel_tok_fine"), F.lit(0))
        ).cast("long").alias("tokens_selected"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("tokens_available").cast("long").alias("tokens_available"),
    )


@register(
    "domain_mix_token_budget",
    doc=f"Data-mixing sampler: every source (domain) gets a token "
    f"budget proportional to its mix weight out of a global "
    f"{MIX_TOKEN_BUDGET}-token target, then a deterministic greedy "
    "prefix (docs ordered by portable hash) fills each budget — the "
    "corpus-reweighting shape used to hit a target domain mixture "
    "for a training run. r16 two-phase selection (guide §2.5): "
    "hash-range bucket totals classify all but ONE bucket per source "
    "with aggregates, and only the budget-straddling bucket's rows "
    "pay the row-level cumsum — no per-source corpus-wide window "
    "task. The weight table is a broadcast scalar; membership is a "
    "pure function of the keys (stable under reruns and appends of "
    "other sources).",
    tags=("sampling", "mixing", "window", "training-data"),
    oracle=f"""
WITH d AS (
    SELECT doc_id, source,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           {_DUCK_HASH} AS h,
           (CAST(substring(source, 4, 8) AS INT) % 3) + 1 AS w
    FROM documents
),
sw AS (
    SELECT SUM(w) AS sum_w
    FROM (SELECT DISTINCT source, w FROM d)
),
c AS (
    SELECT doc_id, source, n_tokens, w,
           CAST(FLOOR({MIX_TOKEN_BUDGET}.0 * w / sum_w) AS BIGINT) AS budget,
           SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum
    FROM d CROSS JOIN sw
)
SELECT source,
       ANY_VALUE(budget) AS token_budget,
       CAST(SUM(CASE WHEN cum <= budget THEN 1 ELSE 0 END) AS BIGINT)
           AS n_selected,
       CAST(SUM(CASE WHEN cum <= budget THEN n_tokens ELSE 0 END) AS BIGINT)
           AS tokens_selected,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_available
FROM c
GROUP BY source
""",
)
def domain_mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.functions.text import (
        portable_hash60,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        "text",
        portable_hash60(F.col("doc_id").cast("string")).alias("h"),
        (
            (F.substring(F.col("source"), 4, 8).cast("int") % 3) + 1
        ).alias("w"),
    )
    sum_w = (
        d.select("source", "w")
        .dropDuplicates(["source"])
        .agg(F.sum("w").alias("sum_w"))
    )
    c = d.join(F.broadcast(sum_w)).withColumn(
        "budget",
        F.floor(
            F.lit(float(MIX_TOKEN_BUDGET)) * F.col("w") / F.col("sum_w")
        ).cast("long"),
    )
    # r16: two-phase greedy prefix (guide §2.5) — see
    # _greedy_prefix_stats; replaces the per-source corpus-wide
    # cumsum window task.
    return _greedy_prefix_stats(c, token_count(F.col("text"))).select(
        "source",
        "token_budget",
        "n_selected",
        "tokens_selected",
        "n_docs",
        "tokens_available",
    )


# --------------------------------------------------------------------------
# Temperature-scaled domain mixing (T5/PaLM alpha=0.5 rebalancing)
# --------------------------------------------------------------------------
TEMP_MIX_BUDGET = 40000


@register(
    "domain_temperature_mix",
    doc="Temperature-scaled data mixing (the T5/multilingual alpha=0.5 "
    "rule): each source's budget share is proportional to "
    "sqrt(tokens_s) instead of tokens_s, up-weighting small domains "
    "the way pretraining mixtures rebalance low-resource slices. "
    "sqrt is IEEE-correctly-rounded in every engine and the share is "
    "quantized to integer micro-units BEFORE the sum, so budgets are "
    "exact integer arithmetic end to end; selection reuses the "
    "deterministic hash-ordered greedy prefix (r16 two-phase bucket "
    "selection — see domain_mix_token_budget); per-source stats are "
    "a broadcast scalar table.",
    tags=("sampling", "mixing", "window", "training-data"),
    oracle=f"""
WITH d AS (
    SELECT doc_id, source,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           {_DUCK_HASH} AS h
    FROM documents
),
per_src AS (
    SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tok_s
    FROM d GROUP BY source
),
q AS (
    SELECT source, tok_s,
           CAST(ROUND(SQRT(CAST(tok_s AS DOUBLE)) * 1e6) AS BIGINT) AS qs
    FROM per_src
),
sw AS (SELECT CAST(SUM(qs) AS BIGINT) AS sum_q FROM q),
c AS (
    SELECT d.doc_id, d.source, d.n_tokens,
           ({TEMP_MIX_BUDGET} * q.qs) // sw.sum_q AS budget,
           SUM(d.n_tokens) OVER (PARTITION BY d.source ORDER BY d.h, d.doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS cum
    FROM d JOIN q ON q.source = d.source CROSS JOIN sw
)
SELECT source,
       ANY_VALUE(budget) AS token_budget,
       CAST(SUM(CASE WHEN cum <= budget THEN 1 ELSE 0 END) AS BIGINT)
           AS n_selected,
       CAST(SUM(CASE WHEN cum <= budget THEN n_tokens ELSE 0 END) AS BIGINT)
           AS tokens_selected,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_available
FROM c
GROUP BY source
""",
)
def domain_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.functions.text import (
        portable_hash60,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        "text",
        portable_hash60(F.col("doc_id").cast("string")).alias("h"),
    )
    per_src = d.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).cast("long").alias("tok_s")
    )
    q = per_src.withColumn(
        "qs",
        F.round(F.sqrt(F.col("tok_s").cast("double")) * 1e6).cast("long"),
    )
    sum_q = q.agg(F.sum("qs").cast("long").alias("sum_q"))
    c = (
        d.join(F.broadcast(q.select("source", "qs")), "source")
        .join(F.broadcast(sum_q))
        .withColumn(
            # integral `div` — exact long division matching DuckDB's //
            "budget",
            F.expr(f"({TEMP_MIX_BUDGET}L * qs) div sum_q"),
        )
    )
    # r16: two-phase greedy prefix (guide §2.5) — see
    # _greedy_prefix_stats; replaces the per-source corpus-wide
    # cumsum window task.
    return _greedy_prefix_stats(c, token_count(F.col("text"))).select(
        "source",
        "token_budget",
        "n_selected",
        "tokens_selected",
        "tokens_available",
    )


N_SHUFFLE_SHARDS = 32
SHUFFLE_EPOCHS = (0, 1)


@register(
    "epoch_shuffle_assignment",
    doc=f"Reproducible per-epoch global shuffle "
    "(operators/sampling.py::epoch_shuffle): every (doc, epoch) maps "
    "to a (shard, position) via the portable md5 hash of key:epoch — "
    "a deterministic pseudo-random permutation that changes completely "
    "between epochs, is append-stable, and needs no rand(). One "
    f"shuffle keyed on (epoch, shard mod {N_SHUFFLE_SHARDS}); shards "
    "bound the rank window's partition, so there is no global sort "
    "and no single-task ordering — the 100 TB epoch-ordering shape.",
    tags=("sampling", "hash", "training-data", "window"),
    oracle=f"""
WITH assigned AS (
    SELECT doc_id, e.epoch,
           ('0x' || substring(
                md5(CAST(doc_id AS VARCHAR) || ':' || e.epoch), 1, 15)
           )::BIGINT AS eh
    FROM documents, (SELECT unnest(range(0, 2)) AS epoch) e
)
SELECT doc_id, CAST(epoch AS INT) AS epoch,
       CAST(eh % {N_SHUFFLE_SHARDS} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (
            PARTITION BY epoch, eh % {N_SHUFFLE_SHARDS}
            ORDER BY eh, doc_id) - 1 AS BIGINT) AS position
FROM assigned
""",
)
def epoch_shuffle_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.sampling import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(
        docs, "doc_id", SHUFFLE_EPOCHS, N_SHUFFLE_SHARDS
    ).select("doc_id", "epoch", "shard", "position")


WEIGHTED_SAMPLE_K = 100


@register(
    "weighted_sample_wor",
    doc="Weighted sampling without replacement (Efraimidis-Spirakis "
    "exponential keys — the standard one-pass distributed algorithm): "
    "rank every document by ln(u)/w with a deterministic hash-uniform "
    "u and weight w = n_chars, take the top "
    f"{WEIGHTED_SAMPLE_K}. The rank is a pure per-row expression "
    "(zero shuffles) and the top-k is a TakeOrderedAndProject "
    "(per-partition heads, no global sort), so the selection is "
    "reproducible and append-stable at any corpus size — the "
    "quality-weighted subcorpus draw a data-mixing stage runs. "
    "operators/sampling.py::weighted_sample_wor.",
    tags=("sampling", "hash", "topk", "training-data"),
    oracle=f"""
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
       ROUND(LN((({_DUCK_HASH} % 1000000) + 1) / 1000001.0)
             / n_chars, 9) AS sample_key
FROM documents
WHERE n_chars > 0
ORDER BY LN((({_DUCK_HASH} % 1000000) + 1) / 1000001.0) / n_chars DESC,
         doc_id
LIMIT {WEIGHTED_SAMPLE_K}
""",
)
def weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.sampling import (
        weighted_sample_wor as sample_op,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = sample_op(docs, "doc_id", "n_chars", WEIGHTED_SAMPLE_K)
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        F.round("sample_key", 9).alias("sample_key"),
    )
