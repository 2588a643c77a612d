"""IVF (inverted-file) approximate nearest neighbor — the third point
on the similarity-search cost curve:

    knn_brute_cosine   O(N*Q)    exact        (baseline)
    ann_lsh_bucketed   O(N/2^p)  data-blind buckets
    ann_ivf_probed     O(N*P/K)  data-aware cells, tunable recall via P

IVF = assign every vector to its nearest of K coarse centroids (the
"inverted file"); a query probes only the P nearest cells. In
production the centroids come from k-means sampling; here they are a
deterministic stand-in (the first K vectors by id) so the DuckDB
oracle can replay the exact same structure — the *plumbing* (broadcast
centroid assignment, cell-keyed shuffle, probe join, per-query top-k)
is the part that matters at 100 TB, and it is identical either way.

All scoring uses the fixed-point integer arithmetic from
functions/vectors.py: assignment and cosine are exact-integer-derived
doubles, deterministically tie-broken, so Spark and DuckDB
hash-match despite floats.

Scale notes: assignment is a broadcast map (K rows broadcast, one pass
over N); the only shuffle keys on cell id (K cells, skew bounded by
cell balance — AQE skew-join would split a hot cell); the probe join
touches ~N*P/K rows instead of N per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions import vectors as VX
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.session import perf_checkpoint
from falcon_metrics_etl_spark.sources import load_table

IVF_K = 16          # coarse centroids (cells)
IVF_PROBE = 2       # cells probed per query
IVF_TOPK = 5
IVF_N_QUERIES = 8

_DUCK_QUANT = (
    "list_transform(embedding, "
    "x -> CAST(round(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))"
)


@register(
    "ann_ivf_probed",
    doc=f"IVF ANN: {IVF_K} deterministic coarse centroids, every vector "
    f"assigned to its nearest cell (broadcast map, exact integer "
    f"scoring), queries probe their {IVF_PROBE} nearest cells and rank "
    f"exact cosine top-{IVF_TOPK} within them. The data-aware "
    "complement to the hyperplane-LSH buckets; recall tunes with "
    "probe count instead of plane count.",
    tags=("vector", "ivf", "join", "window"),
    oracle=f"""
WITH iv AS (
    SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings
),
n AS (
    SELECT vec_id, q, list_dot_product(q, q) AS nsq FROM iv
),
cents AS (
    SELECT vec_id AS cent_id, q AS cq, nsq AS cnsq FROM n
    WHERE vec_id < {IVF_K}
),
aff AS (
    SELECT v.vec_id, v.q, v.nsq, c.cent_id,
           list_dot_product(v.q, c.cq) / sqrt(c.cnsq) AS score,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY list_dot_product(v.q, c.cq) / sqrt(c.cnsq) DESC,
                                       c.cent_id) AS crank
    FROM n v CROSS JOIN cents c
),
assign AS (
    SELECT vec_id, q, nsq, cent_id AS cell FROM aff WHERE crank = 1
),
probes AS (
    SELECT vec_id AS query_id, q AS qv, nsq AS qn, cent_id AS cell
    FROM aff WHERE vec_id < {IVF_N_QUERIES} AND crank <= {IVF_PROBE}
),
scored AS (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           ROUND(list_dot_product(p.qv, a.q) / sqrt(p.qn) / sqrt(a.nsq), 6)
               AS cosine
    FROM probes p JOIN assign a ON a.cell = p.cell
    WHERE a.vec_id <> p.query_id
),
dedup AS (SELECT DISTINCT query_id, neighbor_id, cosine FROM scored),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rank
    FROM dedup
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {IVF_TOPK}
""",
)
def ann_ivf_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.quantize(F.col("embedding")).alias("q")
    )
    n = emb.withColumn("nsq", VX.int_norm_sq(F.col("q")))
    cents = (
        n.filter(F.col("vec_id") < IVF_K)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("q").alias("cq"),
            F.col("nsq").alias("cnsq"),
        )
    )
    # centroid affinity: broadcast the K centroids, score every vector
    score = VX.int_dot(F.col("q"), F.col("cq")).cast("double") / F.sqrt(
        F.col("cnsq").cast("double")
    )
    wc = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("cent_id")
    )
    # r17: the rank filter sits ADJACENT to its window so Spark's
    # WindowGroupLimit pushdown prunes each partition to the rank-1
    # row per vector BEFORE the exchange (the r16 shape checkpointed
    # the full xK ranked frame — the filters lived beyond the
    # checkpoint, so 16N wide rows paid the exchange, the sort AND
    # the checkpoint materialization)
    assign = (
        n.join(F.broadcast(cents))
        .withColumn("score", score)
        .withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") == 1)
        .select("vec_id", "q", "nsq", F.col("cent_id").alias("cell"))
    )
    # probes touch only the IVF_N_QUERIES standing queries: a
    # pushed-down re-scan (PushedFilters: vec_id < N_QUERIES) of the
    # bounded query slice is far cheaper than sharing the N-sized
    # ranked frame through a checkpoint
    probes = (
        n.filter(F.col("vec_id") < IVF_N_QUERIES)
        .join(F.broadcast(cents))
        .withColumn("score", score)
        .withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= IVF_PROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qv"),
            F.col("nsq").alias("qn"),
            F.col("cent_id").alias("cell"),
        )
    )
    scored = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
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
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVF_TOPK)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# fraction of the vectors playing the "newly arrived" delta in the
# incremental index-maintenance query — every 17th vec_id (~6%), the
# same SF-proportional convention as LSH_DELTA_MOD / MEDIA_DELTA_MOD
IVF_DELTA_MOD = 17


@register(
    "ann_ivf_incremental",
    doc="Incremental IVF index maintenance — the vector-side member "
    "of the delta family (text LSH, image bands, video frames; r11): "
    f"new vectors (vec_id % {IVF_DELTA_MOD} == 0 plays the arriving "
    "delta) are assigned to the FROZEN coarse centroids DELTA-ONLY "
    "(broadcast map + per-delta-vector argmin — never a base-wide "
    "re-assignment; a maintenance tick appends these rows to the "
    "persisted inverted file), and each standing query's probe cells "
    "surface its top-k among the NEW candidates — the rows a tick "
    "merges into the per-query result lists by score. Oracle: the "
    "full IVF probe-scored pair set filtered to delta neighbors, "
    "ranked within the delta (the minhash_incremental_update shape).",
    tags=("vector", "ivf", "incremental", "join", "window"),
    oracle=f"""
WITH iv AS (
    SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings
),
n AS (
    SELECT vec_id, q, list_dot_product(q, q) AS nsq FROM iv
),
cents AS (
    SELECT vec_id AS cent_id, q AS cq, nsq AS cnsq FROM n
    WHERE vec_id < {IVF_K}
),
aff AS (
    SELECT v.vec_id, v.q, v.nsq, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY list_dot_product(v.q, c.cq) / sqrt(c.cnsq) DESC,
                                       c.cent_id) AS crank
    FROM n v CROSS JOIN cents c
),
assign AS (
    SELECT vec_id, q, nsq, cent_id AS cell FROM aff
    WHERE crank = 1 AND vec_id % {IVF_DELTA_MOD} = 0
),
probes AS (
    SELECT vec_id AS query_id, q AS qv, nsq AS qn, cent_id AS cell
    FROM aff WHERE vec_id < {IVF_N_QUERIES} AND crank <= {IVF_PROBE}
),
scored AS (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           ROUND(list_dot_product(p.qv, a.q) / sqrt(p.qn) / sqrt(a.nsq), 6)
               AS cosine
    FROM probes p JOIN assign a ON a.cell = p.cell
    WHERE a.vec_id <> p.query_id
),
dedup AS (SELECT DISTINCT query_id, neighbor_id, cosine FROM scored),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rank
    FROM dedup
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {IVF_TOPK}
""",
)
def ann_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.session import staged_index

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.quantize(F.col("embedding")).alias("q")
    )
    n = emb.withColumn("nsq", VX.int_norm_sq(F.col("q")))

    def _cents() -> DataFrame:
        return n.filter(F.col("vec_id") < IVF_K).select(
            F.col("vec_id").alias("cent_id"),
            F.col("q").alias("cq"),
            F.col("nsq").alias("cnsq"),
        )

    # base state reads PERSISTED parquet (r15, verdict #4 — the same
    # staged protocol as every other *_incremental* entry): the
    # centroid table and each standing query's probe routing are
    # maintained state in production (queries re-route only when
    # centroids move), so the cold plan prices the delta assignment,
    # not the routing rebuild. int arrays round-trip parquet exactly.
    # staged keys embed their governing constants (r15 advisor, low
    # #3): changing IVF_K/IVF_PROBE/IVF_N_QUERIES re-keys the state
    # instead of silently serving centroid routing built under the
    # old constants — the _LAYOUT-guard hazard class, solved by keying
    cents = staged_index(
        spark, f"ivf_cents:k={IVF_K}:{sf_dir}", _cents, src_dir=sf_dir
    )
    score = VX.int_dot(F.col("q"), F.col("cq")).cast("double") / F.sqrt(
        F.col("cnsq").cast("double")
    )
    wc = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("cent_id")
    )
    # DELTA-ONLY assignment: the broadcast-affinity window runs over
    # the ~6% slice, never the base (whose assignments a production
    # tick reads from the persisted inverted file)
    assign = (
        n.filter(F.col("vec_id") % IVF_DELTA_MOD == 0)
        .join(F.broadcast(cents))
        .withColumn("score", score)
        .withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") == 1)
        .select("vec_id", "q", "nsq", F.col("cent_id").alias("cell"))
    )
    probes = staged_index(
        spark,
        f"ivf_probes:k={IVF_K}:p={IVF_PROBE}:q={IVF_N_QUERIES}:{sf_dir}",
        lambda: (
            n.filter(F.col("vec_id") < IVF_N_QUERIES)
            .join(F.broadcast(cents))
            .withColumn("score", score)
            .withColumn("crank", F.row_number().over(wc))
            .filter(F.col("crank") <= IVF_PROBE)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("q").alias("qv"),
                F.col("nsq").alias("qn"),
                F.col("cent_id").alias("cell"),
            )
        ),
        src_dir=sf_dir,
    )
    scored = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
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
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVF_TOPK)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


SEMDEDUP_K = 16      # coarse cells for the cluster-scoped dedup
SEMDEDUP_TAU = 0.4   # within-cell cosine threshold


@register(
    "semdedup_prune",
    doc=f"SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup — "
    f"assign every embedding to its nearest of {SEMDEDUP_K} coarse "
    "centroids (broadcast map), compute pairwise cosine ONLY within a "
    f"cell, prune any doc with a >= {SEMDEDUP_TAU}-cosine neighbour of "
    "smaller id (keep-first). The scale answer to all-pairs embedding "
    "dedup: the candidate join keys on cell id, so cost is "
    "sum(|cell|^2) not N^2, and cells are bounded by the clustering. "
    "Output is one row per vector with its cell and kept/pruned status.",
    tags=("vector", "dedup", "semdedup", "training-data"),
    oracle=f"""
WITH iv AS (
    SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings
),
n AS (
    SELECT vec_id, q, list_dot_product(q, q) AS nsq FROM iv
),
cents AS (
    SELECT vec_id AS cent_id, q AS cq, nsq AS cnsq FROM n
    WHERE vec_id < {SEMDEDUP_K}
),
aff AS (
    SELECT v.vec_id, v.q, v.nsq, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY list_dot_product(v.q, c.cq) / sqrt(c.cnsq) DESC,
                                       c.cent_id) AS crank
    FROM n v CROSS JOIN cents c
),
assign AS (
    SELECT vec_id, q, nsq, cent_id AS cell FROM aff WHERE crank = 1
),
dup AS (
    SELECT b.vec_id, COUNT(*) AS n_smaller_dups
    FROM assign a JOIN assign b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.q, b.q) / sqrt(a.nsq) / sqrt(b.nsq)
          >= {SEMDEDUP_TAU}
    GROUP BY b.vec_id
)
SELECT s.vec_id, s.cell,
       CASE WHEN d.vec_id IS NULL THEN 'kept' ELSE 'pruned' END AS status,
       COALESCE(d.n_smaller_dups, 0) AS n_smaller_dups
FROM assign s LEFT JOIN dup d ON s.vec_id = d.vec_id
""",
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.quantize(F.col("embedding")).alias("q")
    )
    n = emb.withColumn("nsq", VX.int_norm_sq(F.col("q")))
    cents = n.filter(F.col("vec_id") < SEMDEDUP_K).select(
        F.col("vec_id").alias("cent_id"),
        F.col("q").alias("cq"),
        F.col("nsq").alias("cnsq"),
    )
    aff = n.join(F.broadcast(cents)).withColumn(
        "score",
        VX.int_dot(F.col("q"), F.col("cq")).cast("double")
        / F.sqrt(F.col("cnsq").cast("double")),
    )
    wc = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("cent_id")
    )
    # the assignment feeds both pair sides AND the final status join —
    # lazy checkpoint computes the window once instead of three times
    # (routed through perf_checkpoint so the documented spot/preemptible
    # opt-out conf is honored — r16 advisor)
    assign = perf_checkpoint(
        aff.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") == 1)
        .select("vec_id", "q", "nsq", F.col("cent_id").alias("cell"))
    )
    a = assign.alias("a")
    b = assign.alias("b")
    # within-cell pairs only: the join keys on cell, so the pair count
    # is sum over cells of |cell|^2 — never the corpus cross product
    dup = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(
            VX.cosine_from_int(
                VX.int_dot(F.col("a.q"), F.col("b.q")),
                F.col("a.nsq"),
                F.col("b.nsq"),
            )
            >= F.lit(SEMDEDUP_TAU)
        )
        .groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(F.count(F.lit(1)).alias("n_smaller_dups"))
    )
    return (
        assign.join(dup, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.when(F.col("n_smaller_dups").isNull(), F.lit("kept"))
            .otherwise(F.lit("pruned"))
            .alias("status"),
            F.coalesce(F.col("n_smaller_dups"), F.lit(0)).alias(
                "n_smaller_dups"
            ),
        )
    )


KMEANS_K = 8


@register(
    "kmeans_lloyd_step",
    doc=f"One Lloyd iteration of spherical k-means over the embeddings: "
    f"{KMEANS_K} deterministic seed centroids (first vec_ids), every "
    "vector assigned to its nearest centroid by exact-integer cosine "
    "(broadcast centroids, HOF dot product), then the new centroids "
    "recomputed as element-wise means in LONG form (cell, pos, mean) — "
    "the iterative-algorithm shape (assign + reduce per iteration) "
    "with nothing but one broadcast join + one shuffle per step",
    tags=("vector", "iterative", "join", "aggregate"),
    oracle=f"""
WITH iv AS (
    SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings
),
n AS (
    SELECT vec_id, q, list_dot_product(q, q) AS nsq FROM iv
),
cents AS (
    SELECT vec_id AS cent_id, q AS cq, nsq AS cnsq FROM n
    WHERE vec_id < {KMEANS_K}
),
aff AS (
    SELECT v.vec_id, v.q, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY list_dot_product(v.q, c.cq) / sqrt(c.cnsq) DESC,
                                       c.cent_id) AS crank
    FROM n v CROSS JOIN cents c
),
assign AS (
    SELECT vec_id, q, cent_id AS cell FROM aff WHERE crank = 1
),
longf AS (
    SELECT cell, unnest(range(1, len(q) + 1)) AS pos, q AS qq
    FROM assign
)
SELECT cell,
       CAST(pos AS INT) AS pos,
       ROUND(CAST(SUM(qq[pos]) AS DOUBLE) / COUNT(*), 4) AS mean_q,
       COUNT(*) AS n_members
FROM longf
GROUP BY 1, 2
""",
)
def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.quantize(F.col("embedding")).alias("q")
    )
    n = emb.withColumn("nsq", VX.int_norm_sq(F.col("q")))
    cents = n.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cent_id"),
        F.col("q").alias("cq"),
        F.col("nsq").alias("cnsq"),
    )
    aff = n.join(F.broadcast(cents)).withColumn(
        "score",
        VX.int_dot(F.col("q"), F.col("cq")).cast("double")
        / F.sqrt(F.col("cnsq").cast("double")),
    )
    wc = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("cent_id")
    )
    assign = (
        aff.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") == 1)
        .select(F.col("cent_id").alias("cell"), "q")
    )
    longf = assign.select(
        "cell", F.posexplode("q").alias("pos0", "val")
    ).select("cell", (F.col("pos0") + 1).cast("int").alias("pos"), "val")
    return longf.groupBy("cell", "pos").agg(
        F.round(F.sum("val").cast("double") / F.count(F.lit(1)), 4).alias(
            "mean_q"
        ),
        F.count(F.lit(1)).alias("n_members"),
    )


@register(
    "label_centroid_similarity",
    doc="Label-separation diagnostic over the embeddings: per-label "
    "centroids from exact integer sums (floor of the single-division "
    "mean keeps every value engine-exact), then pairwise centroid "
    "cosine — low inter-label cosine = well-separated classes, the "
    "embedding-quality check a training pipeline runs before trusting "
    "labels; long-form sums keep the plan one explode + two small "
    "shuffles at any dimensionality",
    tags=("vector", "aggregate", "training-data"),
    oracle=f"""
WITH iv AS (
    SELECT vec_id, label, {_DUCK_QUANT} AS q FROM embeddings
),
longf AS (
    SELECT label, unnest(range(1, len(q) + 1)) AS pos, q AS qq FROM iv
),
cent AS (
    SELECT label, pos,
           CAST(FLOOR(CAST(SUM(qq[pos]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mq,
           COUNT(*) AS n
    FROM longf GROUP BY 1, 2
),
pairs AS (
    SELECT a.label AS label_a, b.label AS label_b,
           SUM(a.mq * b.mq) AS dot,
           SUM(a.mq * a.mq) AS na2,
           SUM(b.mq * b.mq) AS nb2,
           ANY_VALUE(a.n) AS n_a, ANY_VALUE(b.n) AS n_b
    FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
    GROUP BY 1, 2
)
SELECT label_a, label_b,
       ROUND(CAST(dot AS DOUBLE) / sqrt(CAST(na2 AS DOUBLE))
             / sqrt(CAST(nb2 AS DOUBLE)), 6) AS cosine,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
FROM pairs
""",
)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", VX.quantize(F.col("embedding")).alias("q")
    )
    longf = emb.select(
        "label", F.posexplode("q").alias("pos0", "val")
    ).select("label", (F.col("pos0") + 1).alias("pos"), "val")
    cent = longf.groupBy("label", "pos").agg(
        # floor of ONE double division: sums < 2^33 are double-exact,
        # so the floored mean is identical in any engine (int division
        # differs between engines on negatives — truncate vs floor)
        F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mq"),
        F.count(F.lit(1)).alias("n"),
    )
    a, b = cent.alias("a"), cent.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(
            F.sum(F.col("a.mq") * F.col("b.mq")).alias("dot"),
            F.sum(F.col("a.mq") * F.col("a.mq")).alias("na2"),
            F.sum(F.col("b.mq") * F.col("b.mq")).alias("nb2"),
            F.any_value(F.col("a.n")).alias("n_a"),
            F.any_value(F.col("b.n")).alias("n_b"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(
            F.col("dot").cast("double")
            / F.sqrt(F.col("na2").cast("double"))
            / F.sqrt(F.col("nb2").cast("double")),
            6,
        ).alias("cosine"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
    )


# ---------------------------------------------------------------------------
# Scalar int8 quantization (SQ8) — embedding compression before ANN
# ---------------------------------------------------------------------------
SQ8_DIM = 64  # embeddings table dimensionality (TESTDATA.md)


@register(
    "embedding_int8_stats",
    doc="Scalar int8 quantization (the faiss-SQ8 shape a 100 TB "
    "vector store runs before ANN — 4x smaller, cache-resident "
    "codes): per-DIMENSION symmetric absmax scales learned in ONE "
    "64-way aggregate pass (single-row result, broadcast back — no "
    "explode, no per-dim shuffle), codes c_d = round(127*q_d/m_d) "
    "computed as EXACT integer arithmetic over the engine's "
    "fixed-point layer (functions/vectors.py), and per-vector "
    "quality accounting: exact-integer SSE and max-abs error in "
    "127*2^20-scale units, reconstruction cosine (the /127 "
    "dequant factor cancels, so cos(q, c*m) is exact-int-derived), "
    "and relative RMSE in original embedding units. The oracle "
    "replays the same integer formulas; the half-away rounding is "
    "the floor((2a+m)/2m) identity, exact for both engines because "
    "the rational quotient is >= 2^-22 away from any non-attained "
    "integer while double division errs by <= 1 ulp.",
    tags=("vector", "quantization", "training-data", "ann"),
    oracle=f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT))
               AS q
    FROM embeddings
),
mx AS (
    SELECT d, MAX(abs(q[d])) AS m
    FROM q, unnest(range(1, {SQ8_DIM} + 1)) AS t(d)
    GROUP BY d
),
marr AS (SELECT list(m ORDER BY d) AS m FROM mx),
coded AS (
    SELECT vec_id, q, m,
           list_transform(range(1, {SQ8_DIM} + 1), d ->
               CASE WHEN m[d] = 0 THEN 0 ELSE
                   CASE WHEN q[d] < 0 THEN -1 ELSE 1 END *
                   CAST(floor((abs(q[d]) * 127 * 2 + m[d])
                              / (m[d] * 2)) AS BIGINT)
               END) AS c
    FROM q, marr
),
errs AS (
    SELECT vec_id,
           list_transform(range(1, {SQ8_DIM} + 1),
                          d -> 127 * q[d] - c[d] * m[d]) AS e,
           list_transform(range(1, {SQ8_DIM} + 1),
                          d -> q[d] * c[d] * m[d]) AS dterm,
           list_transform(range(1, {SQ8_DIM} + 1), d -> q[d] * q[d]) AS nq_t,
           list_transform(range(1, {SQ8_DIM} + 1),
                          d -> (c[d] * m[d]) * (c[d] * m[d])) AS nd_t
    FROM coded
)
SELECT vec_id,
       {SQ8_DIM} AS n_dims,
       CAST(list_aggregate(list_transform(e, x -> x * x), 'sum')
            AS BIGINT) AS sse,
       CAST(list_aggregate(list_transform(e, x -> abs(x)), 'max')
            AS BIGINT) AS max_abs_err,
       CASE WHEN list_aggregate(nq_t, 'sum') = 0
                 OR list_aggregate(nd_t, 'sum') = 0 THEN NULL
            ELSE ROUND(
                CAST(list_aggregate(dterm, 'sum') AS DOUBLE)
                / sqrt(CAST(list_aggregate(nq_t, 'sum') AS DOUBLE))
                / sqrt(CAST(list_aggregate(nd_t, 'sum') AS DOUBLE)), 6)
       END AS recon_cosine,
       ROUND(sqrt(CAST(list_aggregate(list_transform(e, x -> x * x),
                                      'sum') AS DOUBLE) / {SQ8_DIM})
             / (127.0 * 1048576.0), 8) AS rel_rmse
FROM errs
""",
)
def embedding_int8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.quantize(F.col("embedding")).alias("q")
    )
    absmax = emb.agg(
        F.array(
            *[
                F.max(F.abs(F.element_at("q", d + 1)))
                for d in range(SQ8_DIM)
            ]
        ).alias("m")
    )

    def code(q, m):
        mag = (
            F.floor(
                ((F.abs(q) * 127 * 2 + m).cast("double"))
                / ((m * 2).cast("double"))
            )
        ).cast("long")
        return F.when(m == F.lit(0), F.lit(0).cast("long")).otherwise(
            F.when(q < 0, -mag).otherwise(mag)
        )

    j = (
        emb.crossJoin(F.broadcast(absmax))
        .withColumn("c", F.zip_with("q", "m", code))
        .withColumn(
            "e",
            F.transform(
                F.arrays_zip("q", "m", "c"),
                lambda s: F.lit(127) * s["q"] - s["c"] * s["m"],
            ),
        )
    )
    zero = F.lit(0).cast("long")
    sse = F.aggregate(
        F.transform("e", lambda x: x * x), zero, lambda a, x: a + x
    )
    nq = F.aggregate(
        F.transform("q", lambda x: x * x), zero, lambda a, x: a + x
    )
    nd = F.aggregate(
        F.transform(
            F.arrays_zip("c", "m"), lambda s: (s["c"] * s["m"]) * (s["c"] * s["m"])
        ),
        zero,
        lambda a, x: a + x,
    )
    dot = F.aggregate(
        F.transform(
            F.arrays_zip("q", "c", "m"), lambda s: s["q"] * s["c"] * s["m"]
        ),
        zero,
        lambda a, x: a + x,
    )
    return j.select(
        "vec_id",
        F.lit(SQ8_DIM).cast("int").alias("n_dims"),
        sse.alias("sse"),
        F.array_max(F.transform("e", F.abs)).alias("max_abs_err"),
        F.when((nq == 0) | (nd == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                dot.cast("double")
                / F.sqrt(nq.cast("double"))
                / F.sqrt(nd.cast("double")),
                6,
            )
        )
        .alias("recon_cosine"),
        F.round(
            F.sqrt(sse.cast("double") / SQ8_DIM) / (127.0 * 1048576.0), 8
        ).alias("rel_rmse"),
    )


SQ8_NQ = 8    # query vectors for the recall measurement
SQ8_K = 10    # top-k depth

# r17: the WindowGroupLimit two-phase recall ranking engages only
# above this estimated candidate-frame size (the r16 mix-gate
# pattern); below it the one-pass double window is cheaper.
_RECALL_SPLIT_CONF = "spark.falconMetricsEtl.recallTopkSplitMinBytes"
_RECALL_SPLIT_MIN_BYTES_DEFAULT = 256 * 1024 * 1024


def _code_times_m(q, m):
    """Dequantized SQ8 code c_d * m_d as one exact-integer expression
    (the /127 scale cancels in cosine): magnitude by round-half-up on
    |q|*127/m via the floor((2a+b)/2b) identity, sign reapplied,
    zero-scale dims code to 0."""
    mag = (
        F.floor(
            ((F.abs(q) * 127 * 2 + m).cast("double"))
            / ((m * 2).cast("double"))
        )
    ).cast("long")
    c = F.when(m == F.lit(0), F.lit(0).cast("long")).otherwise(
        F.when(q < 0, -mag).otherwise(mag)
    )
    return c * m


def _int8_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared SQ8 frame: (vec_id, q fixed-point, cm dequantized-code,
    nsq, nsa) with zero-norm vectors dropped (0/0 = NaN cosines rank
    engine-dependently; mirrored by every consumer's oracle)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.quantize(F.col("embedding")).alias("q")
    )
    # the 1-row scale vector is a full-scan aggregate; every consumer
    # of the base frame (queries slice + candidate side, cents +
    # assign + probes) would otherwise re-run that scan — lazy
    # checkpoint computes it once (r17; conf-gated like every other
    # shared-subtree checkpoint)
    absmax = perf_checkpoint(
        emb.agg(
            F.array(
                *[
                    F.max(F.abs(F.element_at("q", d + 1)))
                    for d in range(SQ8_DIM)
                ]
            ).alias("m")
        )
    )
    return (
        emb.crossJoin(F.broadcast(absmax))
        .select(
            "vec_id",
            "q",
            F.zip_with("q", "m", _code_times_m).alias("cm"),
        )
        .withColumn("nsq", VX.int_norm_sq(F.col("q")))
        .withColumn("nsa", VX.int_norm_sq(F.col("cm")))
        .filter((F.col("nsq") > 0) & (F.col("nsa") > 0))
    )


@register(
    "ann_int8_recall",
    doc=f"Recall@{SQ8_K} of int8-quantized similarity search vs the "
    f"exact ranking, per query — the measurement that justifies "
    "shipping SQ8 codes to a 100 TB vector store: both rankings are "
    "cosine top-k over the SAME broadcast-queries scan "
    "(knn_brute_cosine's shape), the exact one on fixed-point "
    "vectors, the approximate one on dequantized codes c_d*m_d (the "
    "/127 factor cancels in cosine). Every dot/norm is an exact "
    "integer (the oracle sums products through HUGEINT via "
    "list_sum to match Spark's exact long fold bit-for-bit before "
    "the single double cast); cosines round to 6 decimals before "
    "ranking with id tie-breaks, so ranks are engine-identical.",
    tags=("vector", "quantization", "ann", "window", "join"),
    oracle=f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT))
               AS q
    FROM embeddings
),
mx AS (
    SELECT d, MAX(abs(q[d])) AS m
    FROM q, unnest(range(1, {SQ8_DIM} + 1)) AS t(d)
    GROUP BY d
),
marr AS (SELECT list(m ORDER BY d) AS m FROM mx),
cmv AS (
    SELECT vec_id, q,
           list_transform(range(1, {SQ8_DIM} + 1), d ->
               (CASE WHEN m[d] = 0 THEN 0 ELSE
                   CASE WHEN q[d] < 0 THEN -1 ELSE 1 END *
                   CAST(floor((abs(q[d]) * 127 * 2 + m[d])
                              / (m[d] * 2)) AS BIGINT)
               END) * m[d]) AS cm
    FROM q, marr
),
n0 AS (
    SELECT vec_id, q, cm,
           CAST(list_sum(list_transform(range(1, {SQ8_DIM} + 1),
                d -> q[d] * q[d])) AS DOUBLE) AS nsq,
           CAST(list_sum(list_transform(range(1, {SQ8_DIM} + 1),
                d -> cm[d] * cm[d])) AS DOUBLE) AS nsa
    FROM cmv
),
-- zero-norm vectors give 0/0 = NaN cosines whose DESC-rank placement
-- is engine-dependent; exclude them on BOTH engines (r9 advisor)
n AS (SELECT * FROM n0 WHERE nsq > 0 AND nsa > 0),
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROUND(CAST(list_sum(list_transform(range(1, {SQ8_DIM} + 1),
                    d -> a.q[d] * b.q[d])) AS DOUBLE)
                 / sqrt(a.nsq) / sqrt(b.nsq), 6) AS ec,
           ROUND(CAST(list_sum(list_transform(range(1, {SQ8_DIM} + 1),
                    d -> a.cm[d] * b.cm[d])) AS DOUBLE)
                 / sqrt(a.nsa) / sqrt(b.nsa), 6) AS ac
    FROM n a JOIN n b ON b.vec_id <> a.vec_id
    WHERE a.vec_id < {SQ8_NQ}
),
ranked AS (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ec DESC, neighbor_id) AS re,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ac DESC, neighbor_id) AS ra
    FROM scored
)
SELECT query_id,
       CAST(SUM(CASE WHEN re <= {SQ8_K} AND ra <= {SQ8_K}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       ROUND(CAST(SUM(CASE WHEN re <= {SQ8_K} AND ra <= {SQ8_K}
                           THEN 1 ELSE 0 END) AS DOUBLE) / {SQ8_K}, 4)
           AS recall_at_k
FROM ranked
GROUP BY query_id
""",
)
def ann_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _int8_base(spark, sf_dir)
    queries = base.filter(F.col("vec_id") < SQ8_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("cm").alias("qcm"),
        F.col("nsq").alias("qnsq"),
        F.col("nsa").alias("qnsa"),
    )
    scored = base.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            VX.cosine_from_int(
                VX.int_dot(F.col("qv"), F.col("q")),
                F.col("qnsq"),
                F.col("nsq"),
            ),
            6,
        ).alias("ec"),
        F.round(
            VX.cosine_from_int(
                VX.int_dot(F.col("qcm"), F.col("cm")),
                F.col("qnsa"),
                F.col("nsa"),
            ),
            6,
        ).alias("ac"),
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("ec").desc(), "neighbor_id"
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("ac").desc(), "neighbor_id"
    )
    # r17, past the size gate: the one-pass shape ranks BOTH orderings
    # as full windows over the 8N candidate frame — two complete sorts
    # of N rows per query, i.e. one straggler sort per query at scale,
    # ranking rows that can never be in either top-k. The two-phase
    # shape splits each ranking into its own filter-adjacent window so
    # WindowGroupLimit prunes to the per-partition top-K before the
    # exchange; the shared scored frame (2 exact-integer HOF dots per
    # candidate, the dominant per-row cost) is computed once behind a
    # lazy checkpoint, and the overlap count is a bounded broadcast
    # self-join. Every query keeps a row: a zero-overlap query is
    # re-attached with 0 via the bounded query list (same group set as
    # the one-pass groupBy — every query has candidates for
    # N > SQ8_NQ). BELOW the gate the one-pass form runs: the
    # checkpoint materialization + extra jobs cost ~10% at bench scale
    # (interleaved A/B). Both paths pinned row-identical by
    # tests/test_relational_gates.py.
    from falcon_metrics_etl_spark.session import scale_gate

    if scale_gate(
        scored, _RECALL_SPLIT_CONF, _RECALL_SPLIT_MIN_BYTES_DEFAULT
    ):
        scored = perf_checkpoint(scored)
        top_e = (
            scored.withColumn("re", F.row_number().over(we))
            .filter(F.col("re") <= SQ8_K)
            .select("query_id", "neighbor_id")
        )
        top_a = (
            scored.withColumn("ra", F.row_number().over(wa))
            .filter(F.col("ra") <= SQ8_K)
            .select("query_id", "neighbor_id")
        )
        # explicit hints: both top sets are bounded (<= K rows per
        # query) but sit above a checkpoint — no planner size stats
        overlap = top_e.join(
            F.broadcast(top_a), ["query_id", "neighbor_id"]
        ).groupBy("query_id").agg(F.count(F.lit(1)).alias("__n"))
        n_overlap = F.coalesce(F.col("__n"), F.lit(0)).cast("long")
        return (
            queries.select("query_id")
            .join(F.broadcast(overlap), "query_id", "left")
            .select(
                "query_id",
                n_overlap.alias("n_overlap"),
                F.round(n_overlap.cast("double") / SQ8_K, 4).alias(
                    "recall_at_k"
                ),
            )
        )
    hit = (
        (F.col("re") <= SQ8_K) & (F.col("ra") <= SQ8_K)
    ).cast("int")
    return (
        scored.withColumn("re", F.row_number().over(we))
        .withColumn("ra", F.row_number().over(wa))
        .groupBy("query_id")
        .agg(
            F.sum(hit).cast("long").alias("n_overlap"),
            F.round(F.sum(hit).cast("double") / SQ8_K, 4).alias(
                "recall_at_k"
            ),
        )
    )


@register(
    "ann_ivf_int8",
    doc=f"IVF + SQ8 composed — the production memory-bound ANN shape: "
    f"cells PRUNE (every vector assigned to its nearest of {IVF_K} "
    f"coarse centroids on the exact fixed-point vectors, queries probe "
    f"their {IVF_PROBE} nearest cells), int8 CODES RANK (candidate "
    "cosine over the dequantized c_d*m_d codes, exact-integer "
    "dot/norms through a long fold / HUGEINT list_sum, same contract "
    "as ann_int8_recall which measured this ranking at 0.9-1.0 "
    "recall@10). At 100 TB the cell shuffle carries the 64-byte code "
    "row instead of the 512-byte fixed-point row — the 8x scan-side "
    "saving that justifies SQ8. Zero-norm vectors are dropped on both "
    "engines (NaN cosines rank engine-dependently).",
    tags=("vector", "ivf", "quantization", "ann", "window", "join"),
    oracle=f"""
WITH q AS (
    SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings
),
mx AS (
    SELECT d, MAX(abs(q[d])) AS m
    FROM q, unnest(range(1, {SQ8_DIM} + 1)) AS t(d)
    GROUP BY d
),
marr AS (SELECT list(m ORDER BY d) AS m FROM mx),
cmv AS (
    SELECT vec_id, q,
           list_transform(range(1, {SQ8_DIM} + 1), d ->
               (CASE WHEN m[d] = 0 THEN 0 ELSE
                   CASE WHEN q[d] < 0 THEN -1 ELSE 1 END *
                   CAST(floor((abs(q[d]) * 127 * 2 + m[d])
                              / (m[d] * 2)) AS BIGINT)
               END) * m[d]) AS cm
    FROM q, marr
),
n0 AS (
    SELECT vec_id, q, cm,
           CAST(list_sum(list_transform(range(1, {SQ8_DIM} + 1),
                d -> q[d] * q[d])) AS DOUBLE) AS nsq,
           CAST(list_sum(list_transform(range(1, {SQ8_DIM} + 1),
                d -> cm[d] * cm[d])) AS DOUBLE) AS nsa
    FROM cmv
),
n AS (SELECT * FROM n0 WHERE nsq > 0 AND nsa > 0),
cents AS (
    SELECT vec_id AS cent_id, q AS cq, nsq AS cnsq FROM n
    WHERE vec_id < {IVF_K}
),
aff AS (
    SELECT v.vec_id, v.cm, v.nsa, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY list_dot_product(v.q, c.cq) / sqrt(c.cnsq) DESC,
                                       c.cent_id) AS crank
    FROM n v CROSS JOIN cents c
),
assign AS (
    SELECT vec_id, cm, nsa, cent_id AS cell FROM aff WHERE crank = 1
),
probes AS (
    SELECT vec_id AS query_id, cm AS qcm, nsa AS qnsa, cent_id AS cell
    FROM aff WHERE vec_id < {IVF_N_QUERIES} AND crank <= {IVF_PROBE}
),
scored AS (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           ROUND(CAST(list_sum(list_transform(range(1, {SQ8_DIM} + 1),
                     d -> p.qcm[d] * a.cm[d])) AS DOUBLE)
                 / sqrt(p.qnsa) / sqrt(a.nsa), 6) AS cosine_int8
    FROM probes p JOIN assign a ON a.cell = p.cell
    WHERE a.vec_id <> p.query_id
),
dedup AS (SELECT DISTINCT query_id, neighbor_id, cosine_int8 FROM scored),
ranked AS (
    SELECT query_id, neighbor_id, cosine_int8,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine_int8 DESC, neighbor_id) AS rank
    FROM dedup
)
SELECT query_id, neighbor_id, cosine_int8, rank FROM ranked
WHERE rank <= {IVF_TOPK}
""",
)
def ann_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _int8_base(spark, sf_dir)
    cents = base.filter(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("cent_id"),
        F.col("q").alias("cq"),
        F.col("nsq").alias("cnsq"),
    )
    # assignment scores on the EXACT vectors (the coarse quantizer is
    # full-precision in a real IVF-SQ index); only cm/nsa ride past it
    score = VX.int_dot(F.col("q"), F.col("cq")).cast("double") / F.sqrt(
        F.col("cnsq").cast("double")
    )
    wc = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("cent_id")
    )
    # r17: filter-adjacent windows (WindowGroupLimit prunes to the
    # rank-1 row per vector before the exchange) + a pushed-down
    # bounded re-scan for the probe slice — replaces the checkpointed
    # full xK ranked frame (see ann_ivf_probed)
    assign = (
        base.join(F.broadcast(cents))
        .withColumn("score", score)
        .withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") == 1)
        .select("vec_id", "cm", "nsa", F.col("cent_id").alias("cell"))
    )
    probes = (
        base.filter(F.col("vec_id") < IVF_N_QUERIES)
        .join(F.broadcast(cents))
        .withColumn("score", score)
        .withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= IVF_PROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("cm").alias("qcm"),
            F.col("nsa").alias("qnsa"),
            F.col("cent_id").alias("cell"),
        )
    )
    scored = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                VX.cosine_from_int(
                    VX.int_dot(F.col("qcm"), F.col("cm")),
                    F.col("qnsa"),
                    F.col("nsa"),
                ),
                6,
            ).alias("cosine_int8"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_int8").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVF_TOPK)
        .select("query_id", "neighbor_id", "cosine_int8", "rank")
    )
