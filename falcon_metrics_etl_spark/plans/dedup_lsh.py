"""Near-dup dedup + similarity-search scale paths: MinHash+LSH,
SimHash, n-gram Jaccard, hyperplane-LSH ANN, winnowing fingerprints.

These are the 100 TB answers to the brute-force baselines in
text_pipeline.py: every query here generates *candidate pairs* through
an LSH bucket join (shuffle keyed on small band/bucket keys) instead
of an O(n^2) cross product, then verifies candidates exactly. All
hashing uses the engine-portable md5-derived 60-bit hash
(functions.text.portable_hash60) so the DuckDB oracle reproduces the
algorithm bit-for-bit — approximation comes only from the algorithm's
own banding, never from engine-dependent hashing.

Scale notes:
- Shingling/minhashing is a map-only projection (JVM codegen, no
  Python); only (doc, band-key) pairs shuffle for the candidate join.
- Band keys are md5 strings — high entropy, so the bucket join is
  skew-free by construction (hot buckets can only come from true
  mass duplication, which AQE skew-join handles).
- Exact-verify joins are restricted to candidates, keeping the
  pairwise stage proportional to the true near-dup rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions import text as TX
from falcon_metrics_etl_spark.functions import vectors as VX
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.session import perf_checkpoint, staged_index
from falcon_metrics_etl_spark.sources import load_table

# ---- MinHash+LSH parameters ----
SHINGLE_N = 3          # word shingles
NUM_HASHES = 12        # minhash signature length
LSH_ROWS = 2           # rows per band
LSH_BANDS = NUM_HASHES // LSH_ROWS
MINHASH_JACCARD_T = 0.30

# ---- SimHash parameters ----
SIM_BITS = 32
SIM_HAMMING_T = 6      # byte-band candidates => guaranteed recall only
                       # for hamming <= 3; documented approximation

# ---- n-gram Jaccard parameters ----
NGRAM_N = 2
NGRAM_JACCARD_T = 0.20
NGRAM_MAX_DF = 200     # prune shingles seen in > MAX_DF docs from
                       # candidate generation (posting-list cap)

# ---- hyperplane LSH ANN parameters ----
ANN_PLANES = 4
ANN_DIM = 64
ANN_K = 5
ANN_N_QUERIES = 8

# ---- winnowing parameters ----
WINNOW_K = 8           # char k-gram length
WINNOW_W = 4           # winnowing window (k-grams per window)


# --------------------------------------------------------------------------
# shared SQL fragments (DuckDB side mirrors Spark exactly)
# --------------------------------------------------------------------------
def _duck_h60(x: str) -> str:
    return TX.DUCK_HASH60.format(x=x)


_DUCK_SHINGLES = f"""
    SELECT doc_id,
           list_distinct(
               list_transform(range(0, len(tk) - {SHINGLE_N - 1}),
                              i -> array_to_string(tk[i+1:i+{SHINGLE_N}], ' '))
           ) AS shs
    FROM (SELECT doc_id, {TX.DUCK_TOKENS.format(x='text')} AS tk FROM documents)
    WHERE len(tk) >= {SHINGLE_N}
"""


# --------------------------------------------------------------------------
# MinHash + LSH banding near-dup pairs
# --------------------------------------------------------------------------
# Carter-Wegman hash family over ONE 30-bit base hash per shingle:
# m_i = min((a_i * h30 + b_i) mod 2^30). With h30, a_i, b_i < 2^30
# every product stays < 2^60 — exact int64 in Spark AND DuckDB (no
# overflow, no wraparound divergence) — so the signature needs one md5
# per shingle + 12 algebraic conditional mins, instead of a 12x row
# explode with 12 md5s per shingle (measured 2.5x faster at sf0.1).
# Constants are fixed odd/offset multipliers (golden-ratio mixing).
_CW_MOD = 1 << 30
_CW_PARAMS = [
    (((2 * i + 1) * 0x9E3779B1) % _CW_MOD | 1, (i * 0x85EBCA6B) % _CW_MOD)
    for i in range(NUM_HASHES)
]


# The complete DuckDB pair-generation chain, factored so downstream
# consumers (dedup_keep_best_lsh) can reuse the exact same candidate
# semantics: ends with an ``lsh_pairs`` CTE of (id_a, id_b, jaccard).
DUCK_LSH_PAIR_CTES = f"""toks AS ({_DUCK_SHINGLES}),
sh AS (SELECT doc_id, unnest(shs) AS sh FROM toks),
hx AS (
    SELECT doc_id, ({_duck_h60("sh")} % {_CW_MOD}) AS h30 FROM sh
),
mins AS (
    SELECT doc_id,
           {', '.join(f"MIN(({a} * h30 + {b}) % {_CW_MOD}) AS m{i}" for i, (a, b) in enumerate(_CW_PARAMS))}
    FROM hx GROUP BY doc_id
),
bands AS (
    SELECT doc_id, t.b AS band,
           md5(CASE t.b {' '.join(
               f"WHEN {b} THEN CAST(m{b * LSH_ROWS} AS VARCHAR) || '|' || CAST(m{b * LSH_ROWS + 1} AS VARCHAR)"
               for b in range(LSH_BANDS))} END) AS bkey
    FROM mins CROSS JOIN range({LSH_BANDS}) t(b)
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, len(shs) AS n FROM toks),
shared AS (
    SELECT c.id_a, c.id_b, COUNT(*) AS n_shared
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
    GROUP BY c.id_a, c.id_b
),
lsh_pairs AS (
    SELECT s.id_a, s.id_b,
           ROUND(CAST(s.n_shared AS DOUBLE) / (na.n + nb.n - s.n_shared), 6) AS jaccard
    FROM shared s
    JOIN sizes na ON na.doc_id = s.id_a
    JOIN sizes nb ON nb.doc_id = s.id_b
    WHERE CAST(s.n_shared AS DOUBLE) / (na.n + nb.n - s.n_shared) >= {MINHASH_JACCARD_T}
)"""


@register(
    "dedup_minhash_lsh",
    doc=f"MinHash({NUM_HASHES})+LSH({LSH_BANDS}x{LSH_ROWS}) near-dup pairs "
    f"over {SHINGLE_N}-word shingles, exact-Jaccard verified at "
    f">= {MINHASH_JACCARD_T}. Candidate generation is a band-key bucket "
    "join (no cross product); verification joins only candidates. "
    "Parity of the full banding algorithm, not just the output "
    "threshold — the oracle reproduces band collisions bit-for-bit.",
    tags=("text", "dedup", "lsh", "minhash"),
    oracle=f"""
WITH {DUCK_LSH_PAIR_CTES}
SELECT id_a, id_b, jaccard FROM lsh_pairs
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks, sh, bands = _lsh_frames(spark, sf_dir)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    return _verify_candidates(cand, sh, toks)


def lsh_frames_of(
    docs: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The MinHash+LSH building blocks over a (doc_id, text) frame:
    returns (toks, sh, bands) — distinct shingle arrays, the exploded
    (doc_id, shingle) stream, and the (doc_id, band, bkey) bucket
    stream. All three are scan-side projections + ONE doc_id-keyed
    aggregation; at 100 TB the ``bands`` frame is what a maintained
    dedup index persists between runs (streaming/corpus_tick.py is
    the maintainer)."""
    toks = shingle_arrays_of(docs)
    sh = toks.select("doc_id", F.explode("shs").alias("sh"))
    return toks, sh, bands_of_shingles(sh)


def shingle_arrays_of(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, shs): the distinct shingle arrays —
    the corpus tick's shingle_index shape."""
    # materialize the token array before shingling: HOF lambdas are
    # interpreted, so an inline split() would re-evaluate per element
    return (
        docs.select("doc_id", TX.tokens(F.col("text")).alias("tk"))
        .filter(F.size("tk") >= SHINGLE_N)
        .select(
            "doc_id",
            F.array_distinct(TX.word_shingles(F.col("tk"), SHINGLE_N)).alias(
                "shs"
            ),
        )
    )


def bands_of_shingles(sh: DataFrame) -> DataFrame:
    """(doc_id, sh) exploded shingles -> (doc_id, band, bkey) LSH
    bucket rows — the corpus tick's band_index shape. One base hash
    per (doc, shingle); 12 Carter-Wegman mins per doc (algebraic
    aggregates — partial aggregation map-side, one shuffle keyed on
    doc_id, no seed explode)."""
    hashed = sh.withColumn("h30", TX.portable_hash60(F.col("sh")) % _CW_MOD)
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h30") + F.lit(b)) % _CW_MOD).alias(f"m{i}")
            for i, (a, b) in enumerate(_CW_PARAMS)
        ]
    )

    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.col(f"m{b * LSH_ROWS}").cast("string"),
                    F.col(f"m{b * LSH_ROWS + 1}").cast("string"),
                )
            ).alias("bkey"),
        )
        for b in range(LSH_BANDS)
    ]
    return mins.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))


def _lsh_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    return lsh_frames_of(load_table(spark, sf_dir, "documents"))


def _verify_candidates(
    cand: DataFrame, sh: DataFrame, toks: DataFrame
) -> DataFrame:
    """Exact-Jaccard verification of (id_a, id_b) candidate pairs via a
    shingle equi-join — joins only candidates, never all pairs."""
    sizes = toks.select("doc_id", F.size("shs").alias("n"))
    shared = (
        cand.join(sh.alias("sa"), F.col("sa.doc_id") == F.col("id_a"))
        .join(
            sh.alias("sb"),
            (F.col("sb.doc_id") == F.col("id_b"))
            & (F.col("sb.sh") == F.col("sa.sh")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("na.n") + F.col("nb.n") - F.col("n_shared")
    )
    return (
        shared.join(sizes.alias("na"), F.col("na.doc_id") == F.col("id_a"))
        .join(sizes.alias("nb"), F.col("nb.doc_id") == F.col("id_b"))
        .filter(jac >= MINHASH_JACCARD_T)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


# fraction of the corpus playing the "newly arrived" delta in the
# incremental index-maintenance query: every 17th doc (~6%), a
# SF-proportional slice so the delta/base ratio is stable across scales
LSH_DELTA_MOD = 17


@register(
    "minhash_incremental_update",
    doc="Incremental dedup-index maintenance — the delta shape a "
    "100 TB near-dup pipeline actually runs per ingest batch: new "
    "documents (doc_id % 17 == 0 plays the arriving delta) get "
    "signatures computed DELTA-ONLY, probe the maintained band index "
    "(base + delta buckets) with a band-key equi-join, and only "
    "candidates touching the delta are exact-Jaccard verified. "
    "Never recomputes base-base pairs; candidate generation is "
    "delta-sized on the probe side. Same banding/verification "
    "semantics as dedup_minhash_lsh (the oracle is its pair set "
    "filtered to delta-touching pairs).",
    tags=("text", "dedup", "lsh", "minhash", "incremental"),
    oracle=f"""
WITH {DUCK_LSH_PAIR_CTES}
SELECT id_a, id_b, jaccard FROM lsh_pairs
WHERE id_a % {LSH_DELTA_MOD} = 0 OR id_b % {LSH_DELTA_MOD} = 0
""",
)
def minhash_incremental_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the base side reads PERSISTED state (r14): the shingle arrays
    # and band index of the base slice land once under the state root
    # (the corpus tick's shingle_index / band_index shapes) and every
    # invocation shingles + signs only the ~6% delta
    docs = load_table(spark, sf_dir, "documents")
    is_d = F.col("doc_id") % LSH_DELTA_MOD == 0
    # keys embed the governing constants (r15 advisor, low #3): a
    # shingle-width or banding change re-keys the staged state instead
    # of silently probing signatures built under the old layout
    toks_base = staged_index(
        spark,
        f"lsh_toks_base:n={SHINGLE_N}:{sf_dir}",
        lambda: shingle_arrays_of(docs.filter(~is_d)),
        src_dir=sf_dir,
    )
    bands_base = staged_index(
        spark,
        f"lsh_band_base:n={SHINGLE_N}:b={LSH_BANDS}x{LSH_ROWS}:{sf_dir}",
        lambda: bands_of_shingles(
            toks_base.select("doc_id", F.explode("shs").alias("sh"))
        ),
        src_dir=sf_dir,
    )
    toks_delta = perf_checkpoint(shingle_arrays_of(docs.filter(is_d)))
    delta_bands = perf_checkpoint(
        bands_of_shingles(
            toks_delta.select("doc_id", F.explode("shs").alias("sh"))
        )
    )
    toks = toks_base.unionByName(toks_delta)
    sh = toks.select("doc_id", F.explode("shs").alias("sh"))
    bands = bands_base.unionByName(delta_bands)
    cand = (
        delta_bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
        )
        .distinct()
    )
    return _verify_candidates(cand, sh, toks)


# --------------------------------------------------------------------------
# SimHash (map-only signature)
# --------------------------------------------------------------------------
def _spark_simhash_expr() -> F.Column:
    """32-bit simhash as a single codegen expression over token hashes.

    Per bit j: net = sum over tokens of +-1 by bit j of the token's
    portable hash; simhash bit j set iff net > 0. Pure projection —
    zero shuffle, the ideal 100 TB shape.
    """
    terms = [
        f"(CASE WHEN aggregate(hs, CAST(0 AS BIGINT), "
        f"(acc, h) -> acc + (2 * (shiftright(h, {j}) & 1) - 1)) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(SIM_BITS)
    ]
    return F.expr(" + ".join(terms))


def _duck_simhash_expr() -> str:
    terms = [
        f"(CASE WHEN list_sum(list_transform(hs, "
        f"h -> 2 * ((h >> {j}) & 1) - 1)) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(SIM_BITS)
    ]
    return " + ".join(terms)


_DUCK_SIMHASH_DOCS = f"""
    SELECT doc_id, {_duck_simhash_expr()} AS simhash
    FROM (
        SELECT doc_id,
               list_transform({TX.DUCK_TOKENS.format(x='text')},
                              t -> {_duck_h60('t')}) AS hs
        FROM documents
    )
"""


def _spark_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.transform(TX.tokens(F.col("text")), TX.portable_hash60).alias("hs"),
    ).select("doc_id", _spark_simhash_expr().alias("simhash"))


@register(
    "dedup_simhash",
    doc=f"{SIM_BITS}-bit SimHash signature per document — a pure map-side "
    "projection (token hash -> per-bit +-1 vote -> sign), no shuffle at "
    "all; the cheapest near-dup signal at 100 TB",
    tags=("text", "dedup", "simhash", "expression"),
    oracle=f"SELECT doc_id, simhash FROM ({_DUCK_SIMHASH_DOCS})",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spark_simhash_docs(spark, sf_dir)


@register(
    "simhash_hamming_pairs",
    doc=f"SimHash near-dup pairs: byte-band LSH candidates (4 bands of 8 "
    f"bits; guaranteed recall for hamming <= 3, approximate above) "
    f"verified at hamming <= {SIM_HAMMING_T} via bit_count(xor)",
    tags=("text", "dedup", "simhash", "lsh"),
    oracle=f"""
WITH s AS ({_DUCK_SIMHASH_DOCS}),
bands AS (
    SELECT doc_id, t.b AS band, (simhash >> (t.b * 8)) & 255 AS byte, simhash
    FROM s CROSS JOIN range(4) t(b)
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.simhash AS sh_a, b.simhash AS sh_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {SIM_HAMMING_T}
""",
)
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _spark_simhash_docs(spark, sf_dir)
    bands = s.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn(
        "byte", F.expr("(simhash >> (band * 8)) & 255")
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.byte") == F.col("b.byte"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.expr("sh_a ^ sh_b"))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= SIM_HAMMING_T)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted-index join
# --------------------------------------------------------------------------
@register(
    "ngram_jaccard_pairs",
    doc=f"Exact {NGRAM_N}-gram Jaccard near-dup pairs >= {NGRAM_JACCARD_T} "
    "via inverted-index (posting-list) self-join; shingles with document "
    f"frequency > {NGRAM_MAX_DF} are pruned from candidate generation "
    "(the standard hot-posting cap) but counted in exact verification",
    tags=("text", "dedup", "jaccard", "join"),
    oracle=f"""
WITH toks AS (
    SELECT doc_id,
           list_distinct(
               list_transform(range(0, len(tk) - {NGRAM_N - 1}),
                              i -> array_to_string(tk[i+1:i+{NGRAM_N}], ' '))
           ) AS shs
    FROM (SELECT doc_id, {TX.DUCK_TOKENS.format(x='text')} AS tk FROM documents)
    WHERE len(tk) >= {NGRAM_N}
),
sh AS (SELECT doc_id, unnest(shs) AS sh FROM toks),
rare AS (
    SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= {NGRAM_MAX_DF}
),
cand AS (
    SELECT DISTINCT sa.doc_id AS id_a, sb.doc_id AS id_b
    FROM sh sa
    JOIN rare r ON r.sh = sa.sh
    JOIN sh sb ON sb.sh = sa.sh AND sa.doc_id < sb.doc_id
),
sizes AS (SELECT doc_id, len(shs) AS n FROM toks),
shared AS (
    SELECT c.id_a, c.id_b, COUNT(*) AS n_shared
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
    GROUP BY c.id_a, c.id_b
)
SELECT s.id_a, s.id_b,
       ROUND(CAST(s.n_shared AS DOUBLE) / (na.n + nb.n - s.n_shared), 6) AS jaccard
FROM shared s
JOIN sizes na ON na.doc_id = s.id_a
JOIN sizes nb ON nb.doc_id = s.id_b
WHERE CAST(s.n_shared AS DOUBLE) / (na.n + nb.n - s.n_shared) >= {NGRAM_JACCARD_T}
""",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # materialized token column (see dedup_minhash_lsh note)
    toks = (
        docs.select("doc_id", TX.tokens(F.col("text")).alias("tk"))
        .filter(F.size("tk") >= NGRAM_N)
        .select(
            "doc_id",
            F.array_distinct(TX.word_shingles(F.col("tk"), NGRAM_N)).alias(
                "shs"
            ),
        )
    )
    sh = toks.select("doc_id", F.explode("shs").alias("sh"))

    rare = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= NGRAM_MAX_DF
    ).select("sh")

    cand = (
        sh.alias("sa")
        .join(rare.alias("r"), F.col("r.sh") == F.col("sa.sh"))
        .join(
            sh.alias("sb"),
            (F.col("sb.sh") == F.col("sa.sh"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .select(
            F.col("sa.doc_id").alias("id_a"), F.col("sb.doc_id").alias("id_b")
        )
        .distinct()
    )
    sizes = toks.select("doc_id", F.size("shs").alias("n"))
    shared = (
        cand.join(sh.alias("sa"), F.col("sa.doc_id") == F.col("id_a"))
        .join(
            sh.alias("sb"),
            (F.col("sb.doc_id") == F.col("id_b"))
            & (F.col("sb.sh") == F.col("sa.sh")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("na.n") + F.col("nb.n") - F.col("n_shared")
    )
    return (
        shared.join(sizes.alias("na"), F.col("na.doc_id") == F.col("id_a"))
        .join(sizes.alias("nb"), F.col("nb.doc_id") == F.col("id_b"))
        .filter(jac >= NGRAM_JACCARD_T)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# Hyperplane-LSH bucketed ANN (the scale path for knn_brute_cosine)
# --------------------------------------------------------------------------
def _plane_sign_sql(p: int, vec: str, idx_base: int) -> str:
    """Deterministic pseudo-hyperplane: weight(p, j) = +1 iff
    (1 + 31p + 37j) % 97 < 48 else -1 — engine-portable arithmetic,
    no RNG. Returns the projection sum expression (exact int math on
    quantized vectors)."""
    return (
        f"aggregate(sequence(0, {ANN_DIM - 1}), CAST(0 AS BIGINT), (acc, j) -> "
        f"acc + (CASE WHEN ((1 + 31 * {p} + 37 * j) % 97) < 48 "
        f"THEN element_at({vec}, j + {idx_base}) "
        f"ELSE -element_at({vec}, j + {idx_base}) END))"
    )


def _duck_plane_sign(p: int, vec: str) -> str:
    return (
        f"list_sum(list_transform(range(0, {ANN_DIM}), j -> "
        f"CASE WHEN ((1 + 31 * {p} + 37 * j) % 97) < 48 "
        f"THEN {vec}[j + 1] ELSE -{vec}[j + 1] END))"
    )


@register(
    "ann_lsh_bucketed",
    doc=f"ANN scale path: {ANN_PLANES} deterministic random-hyperplane "
    f"signs bucket the space into {2 ** ANN_PLANES} cells; top-{ANN_K} "
    "cosine is computed only within the query's bucket (candidate set "
    "~N/16 instead of N). Exact integer projections/dots keep the "
    "oracle bit-identical; approximation is the algorithm's own recall.",
    tags=("vector", "lsh", "join", "window"),
    oracle=f"""
WITH iv AS (
    SELECT vec_id,
           list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
    FROM embeddings
),
b AS (
    SELECT vec_id, q, list_dot_product(q, q) AS nsq,
           {' + '.join(f"(CASE WHEN {_duck_plane_sign(p, 'q')} >= 0 THEN {1 << p} ELSE 0 END)" for p in range(ANN_PLANES))} AS bucket
    FROM iv
),
scored AS (
    SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND(list_dot_product(a.q, c.q) / sqrt(a.nsq) / sqrt(c.nsq), 6) AS cosine
    FROM b a JOIN b c ON c.bucket = a.bucket AND c.vec_id <> a.vec_id
    WHERE a.vec_id < {ANN_N_QUERIES}
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {ANN_K}
""",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.quantize(F.col("embedding")).alias("q")
    )
    bucket = F.expr(
        " + ".join(
            f"(CASE WHEN {_plane_sign_sql(p, 'q', 1)} >= 0 THEN {1 << p} ELSE 0 END)"
            for p in range(ANN_PLANES)
        )
    )
    b = emb.select(
        "vec_id", "q", VX.int_norm_sq(F.col("q")).alias("nsq"), bucket.alias("bucket")
    )
    queries = b.filter(F.col("vec_id") < ANN_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("nsq").alias("qn"),
        F.col("bucket").alias("qb"),
    )
    scored = b.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("query_id")),
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
        .filter(F.col("rank") <= ANN_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# Winnowing document fingerprints (rolling-hash k-grams + window min)
# --------------------------------------------------------------------------
@register(
    "doc_fingerprint_winnowing",
    doc=f"Winnowing fingerprints (Schleimer/Wilkerson/Aiken): hash every "
    f"{WINNOW_K}-char k-gram, take the min hash of each sliding window "
    f"of {WINNOW_W} k-grams, dedupe — guarantees a shared fingerprint "
    "for any match of length >= k + w - 1. Explode + window-min + "
    "distinct; partitioned per doc so it scales linearly.",
    tags=("text", "fingerprint", "window"),
    oracle=f"""
WITH pos AS (
    SELECT doc_id, text, unnest(range(1, length(text) - {WINNOW_K} + 2)) AS p
    FROM documents WHERE length(text) >= {WINNOW_K + WINNOW_W - 1}
),
kh AS (
    SELECT doc_id, p,
           {_duck_h60(f"substring(text, p, {WINNOW_K})")} AS h,
           length(text) - {WINNOW_K} + 1 AS n_kgrams
    FROM pos
),
wm AS (
    SELECT doc_id, p, n_kgrams,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS fp
    FROM kh
)
SELECT DISTINCT doc_id, fp
FROM wm WHERE p <= n_kgrams - {WINNOW_W} + 1
""",
)
def doc_fingerprint_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= WINNOW_K + WINNOW_W - 1
    )
    kh = docs.select(
        "doc_id",
        (F.length("text") - WINNOW_K + 1).alias("n_kgrams"),
        F.explode(
            F.sequence(F.lit(1), F.length("text") - WINNOW_K + 1)
        ).alias("p"),
        "text",
    ).select(
        "doc_id",
        "n_kgrams",
        "p",
        TX.portable_hash60(
            F.col("text").substr(F.col("p"), F.lit(WINNOW_K))
        ).alias("h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    return (
        kh.withColumn("fp", F.min("h").over(w))
        .filter(F.col("p") <= F.col("n_kgrams") - WINNOW_W + 1)
        .select("doc_id", "fp")
        .distinct()
    )


# --------------------------------------------------------------------------
# LSH recall audit (r11): measured recall of the banded index against
# exact Jaccard on a sampled query slice — the live-accounting sibling
# of ann_int8_recall / the Bloom FP measurement
# --------------------------------------------------------------------------
LSH_AUDIT_MOD = 11  # ~9% of docs play the audited query slice


@register(
    "dedup_lsh_recall_audit",
    doc=f"Measured LSH recall, per audited doc: every {LSH_AUDIT_MOD}th "
    "doc plays a query, its TRUE neighbors (exact Jaccard >= "
    f"{MINHASH_JACCARD_T}) are computed through the shingle inverted "
    "index restricted to the sample side (complete for any T > 0 — a "
    "qualifying pair must share a shingle — and linear in corpus "
    "size, never all-pairs), and the banded candidate set is scored "
    "against them: n_true, n_caught, recall per doc. The accept/"
    "reject measurement for shipping a banding config — the dedup "
    f"family's sibling of ann_int8_recall ({LSH_BANDS}x{LSH_ROWS} "
    "bands over 12 minhashes give PROBABILISTIC recall at the 0.3 "
    "threshold; this query reports the number instead of asserting "
    "it). Docs with no true neighbor are excluded (recall undefined).",
    tags=("text", "dedup", "lsh", "minhash", "audit", "training-data"),
    oracle=f"""
WITH {DUCK_LSH_PAIR_CTES},
strue AS (
    SELECT sa.doc_id AS qid, sb.doc_id AS oid, COUNT(*) AS n_shared
    FROM sh sa
    JOIN sh sb ON sb.sh = sa.sh AND sa.doc_id <> sb.doc_id
    WHERE sa.doc_id % {LSH_AUDIT_MOD} = 0
    GROUP BY sa.doc_id, sb.doc_id
),
truep AS (
    SELECT qid, oid FROM strue s
    JOIN sizes na ON na.doc_id = s.qid
    JOIN sizes nb ON nb.doc_id = s.oid
    WHERE CAST(s.n_shared AS DOUBLE) / (na.n + nb.n - s.n_shared)
          >= {MINHASH_JACCARD_T}
),
caught AS (
    SELECT DISTINCT a.doc_id AS qid, b.doc_id AS oid
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
              AND a.doc_id <> b.doc_id
    WHERE a.doc_id % {LSH_AUDIT_MOD} = 0
)
SELECT t.qid AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN c.qid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_caught,
       ROUND(CAST(SUM(CASE WHEN c.qid IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 4) AS recall
FROM truep t
LEFT JOIN caught c ON c.qid = t.qid AND c.oid = t.oid
GROUP BY t.qid
""",
)
def dedup_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.session import perf_checkpoint

    toks, sh, bands = _lsh_frames(spark, sf_dir)
    # both streams feed a sample-side AND a full-side branch — decode/
    # shingle once (the r11 media-family discipline)
    sh = perf_checkpoint(sh)
    bands = perf_checkpoint(bands)
    sample_sh = sh.filter(F.col("doc_id") % LSH_AUDIT_MOD == 0)
    shared = (
        sample_sh.alias("sa")
        .join(
            sh.alias("sb"),
            (F.col("sb.sh") == F.col("sa.sh"))
            & (F.col("sa.doc_id") != F.col("sb.doc_id")),
        )
        .groupBy(
            F.col("sa.doc_id").alias("qid"),
            F.col("sb.doc_id").alias("oid"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = toks.select("doc_id", F.size("shs").alias("n"))
    jac = F.col("n_shared").cast("double") / (
        F.col("na.n") + F.col("nb.n") - F.col("n_shared")
    )
    truep = (
        shared.join(sizes.alias("na"), F.col("na.doc_id") == F.col("qid"))
        .join(sizes.alias("nb"), F.col("nb.doc_id") == F.col("oid"))
        .filter(jac >= MINHASH_JACCARD_T)
        .select("qid", "oid")
    )
    caught = (
        bands.filter(F.col("doc_id") % LSH_AUDIT_MOD == 0)
        .alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("qid"),
            F.col("b.doc_id").alias("oid"),
            F.lit(1).alias("hit"),
        )
        .distinct()
    )
    return (
        truep.join(caught, ["qid", "oid"], "left")
        .groupBy(F.col("qid").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_true"),
            F.sum(
                F.when(F.col("hit").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_caught"),
        )
        .withColumn(
            "recall",
            F.round(
                F.col("n_caught").cast("double") / F.col("n_true"), 4
            ),
        )
    )
