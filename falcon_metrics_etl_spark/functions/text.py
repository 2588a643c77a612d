"""Text-analysis column functions for the training-data pipeline layer.

All pure Catalyst expressions (split/filter/transform higher-order
functions) — no Python in the hot path, so these scan-side ops run at
full codegen speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic stopword list used by quality scoring + lang-id
STOPWORDS = ("a", "the", "of", "and", "to")

# marker vocabularies for the n-gram/keyword language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "a", "value", "fast", "slow"),
    "sql": ("query", "join", "table", "scan", "agg"),
    "ops": ("batch", "stream", "merge", "window", "spark"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    stop = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.size(stop).cast("double") / F.size(toks)


def punct_ratio(text: Column) -> Column:
    """Share of non-alphanumeric-non-space characters."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped).cast("double") / F.length(text)


def mean_token_length(text: Column) -> Column:
    no_space = F.regexp_replace(text, r"\s+", "")
    return F.length(no_space).cast("double") / token_count(text)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of case/whitespace-normalized text.

    The normalization (lower + collapse whitespace) is the
    key-generation step of fingerprint dedup; md5 keeps it engine-
    portable and deterministic.
    """
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens that belong to a marker vocabulary."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*markers)))


def portable_hash60(col: Column) -> Column:
    """Deterministic engine-portable 60-bit hash of a string.

    First 15 hex chars of md5, base-16 -> bigint. Identical in Spark
    (``conv(substring(md5(x),1,15),16,10)``) and DuckDB
    (``('0x' || substring(md5(x),1,15))::BIGINT``); always positive
    (< 2^60) so min/xor/shift semantics match across engines. md5 is
    JVM-side codegen — no Python in the path.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_shingles(toks: Column, n: int) -> Column:
    """n-token shingles ('a b c') of a token array, preserving order.

    Built as an n-way zip_with over k-shifted array views instead of a
    transform-over-indices: HOF lambdas are interpreted, so any outer
    expression captured in the lambda body (the token array itself — or
    worse, the split() that produced it after CollapseProject inlines
    the alias) is re-evaluated PER ELEMENT. Here every lambda body
    references only its own lambda variables; the slices evaluate once
    per row. Measured ~9x faster than the index-lambda form on
    100-token docs regardless of whether the caller materialized the
    token column.
    """
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))  # shingle count
    parts = [F.slice(toks, k + 1, m) for k in range(n)]
    out = parts[0]
    for part in parts[1:]:
        out = F.zip_with(out, part, lambda a, b: F.concat_ws(" ", a, b))
    return out


# DuckDB fragments mirroring the above exactly (shared by oracle SQL)
DUCK_HASH60 = "(('0x' || substring(md5({x}), 1, 15))::BIGINT)"
DUCK_TOKENS = "string_split_regex(trim({x}), '\\s+')"


def substring_window_hashes(docs, w: int, with_pos: bool = True):
    """(doc_id[, pos], h1, h2) for every stride-1 ``w``-token window of
    ``docs.text`` — THE canonical window/key builder shared by the
    whole substring-dedup family (batch queries in
    plans/text_pipeline.py AND the streaming admission filter, whose
    persisted index is only compatible because both sides call this
    one function). Pure JVM: tokens -> transform/slice/array_join HOF
    -> one (pos)explode -> 128-bit xxhash64 pair ('s2' second seed);
    raw window text never leaves the projection. Docs shorter than
    ``w`` tokens emit nothing."""
    from pyspark.sql import DataFrame  # local: avoid cycle at import

    toks = docs.select("doc_id", tokens(F.col("text")).alias("tk")).filter(
        F.size("tk") >= w
    )
    win_expr = F.transform(
        F.sequence(F.lit(0), F.size("tk") - w),
        lambda i: F.array_join(F.slice("tk", i + 1, w), " "),
    )
    if with_pos:
        ex = toks.select(
            "doc_id", F.posexplode(win_expr).alias("pos", "win")
        )
        keep = ["doc_id", "pos"]
    else:
        ex = toks.select("doc_id", F.explode(win_expr).alias("win"))
        keep = ["doc_id"]
    return ex.select(
        *keep,
        F.xxhash64("win").alias("h1"),
        F.xxhash64(F.lit("s2"), F.col("win")).alias("h2"),
    )


# ---- hashed-ngram linear quality classifier (fastText-style) ----------
# deterministic stand-in weights: bucket id -> milli-weight via a
# multiplicative hash; a trained model replaces bucket_weight with a
# broadcast array lookup, same plan shape
QC_BUCKETS = 4096
QC_MULT = 2654435761  # Knuth multiplicative constant
QC_BIAS = -0.1        # fixed logit bias (slight reject prior)


def hashed_ngram_features(toks: Column) -> Column:
    """Unigram + bigram feature list of a token array (hashing-trick
    input). Lambda-discipline-safe: built from word_shingles."""
    return F.concat(toks, word_shingles(toks, 2))


def hashed_ngram_weight_sum(toks: Column) -> Column:
    """Integer milli-unit weight sum over the hashed features — the
    whole classifier forward pass as ONE aggregate() HOF (zero
    shuffles; every lambda references only its own variables)."""

    def bucket_weight(f):
        bucket = F.pmod(portable_hash60(f), F.lit(QC_BUCKETS))
        return F.pmod(bucket * F.lit(QC_MULT), F.lit(2001)) - F.lit(1000)

    return F.aggregate(
        hashed_ngram_features(toks),
        F.lit(0).cast("long"),
        lambda acc, f: acc + bucket_weight(f),
    )


def hashed_ngram_weight_sum_fast(toks: Column) -> Column:
    """xxhash64 production twin of ``hashed_ngram_weight_sum`` — the
    one-line swap that function's cost note documents: identical
    bucket->weight mapping, but the feature hash is Spark's native
    non-cryptographic xxhash64 instead of the engine-portable
    md5+conv pair. DuckDB cannot replay XXH64(seed=42), so queries
    built on this register rows-only; the md5 twin stays the
    oracle-parity baseline (same split the substring-dedup family
    made for its internal keys)."""

    def bucket_weight(f):
        bucket = F.pmod(F.xxhash64(f), F.lit(QC_BUCKETS))
        return F.pmod(bucket * F.lit(QC_MULT), F.lit(2001)) - F.lit(1000)

    return F.aggregate(
        hashed_ngram_features(toks),
        F.lit(0).cast("long"),
        lambda acc, f: acc + bucket_weight(f),
    )


# DuckDB fragments mirroring the classifier exactly ({t} = token-list
# SQL expression); wsum pairs with n_features = 2*len(t) - 1
DUCK_NGRAM_FEATURES = (
    "list_concat({t}, list_transform(range(1, len({t})), "
    "i -> {t}[i] || ' ' || {t}[i + 1]))"
)
DUCK_NGRAM_WSUM = (
    "CAST(list_sum(list_transform(" + DUCK_NGRAM_FEATURES + ", f -> "
    "((((('0x' || substring(md5(f), 1, 15))::BIGINT) % "
    + str(QC_BUCKETS) + ") * " + str(QC_MULT) + ") % 2001) - 1000"
    ")) AS BIGINT)"
)


# --------------------------------------------------------------------------
# Shared corpus-cleaning gate (batch audits + the incremental ingest tick)
# --------------------------------------------------------------------------
GATE_MIN_TOKENS = 30  # quality gate: minimum whitespace-token count


def cleaning_gate_frame(docs: Column, fast: bool = True):
    """(doc_id, text) frame -> the per-doc gate-score frame
    ``(doc_id, text, fp, h_en, h_sql, h_ops, n_tokens, wsum)`` shared
    by corpus_cleaning_audit (md5 classifier, ``fast=False``),
    corpus_cleaning_audit_fast and streaming/corpus_tick.py (xxhash64
    twin, ``fast=True``). One definition so a threshold or marker
    change can never silently diverge the batch audits from the
    incremental tick (advisor r10)."""
    t = F.col("text")
    wsum = (
        hashed_ngram_weight_sum_fast(tokens(t))
        if fast
        else hashed_ngram_weight_sum(tokens(t))
    )
    return docs.select(
        "doc_id",
        "text",
        F.md5(F.concat_ws(" ", F.slice(tokens(t), 1, 3))).alias("fp"),
        marker_hits(t, LANG_MARKERS["en"]).alias("h_en"),
        marker_hits(t, LANG_MARKERS["sql"]).alias("h_sql"),
        marker_hits(t, LANG_MARKERS["ops"]).alias("h_ops"),
        token_count(t).alias("n_tokens"),
        wsum.alias("wsum"),
    )


def cleaning_gate_verdict() -> Column:
    """First failing PER-DOC gate over a cleaning_gate_frame row —
    lang (marker argmax must be 'en'), quality (token floor),
    classifier (prob >= 0.5 in exact integer form: wsum >=
    100 * n_features with n_features = 2*n_tokens - 1) — else
    'pass'. The corpus-dependent duplicate gate (fp window or fp
    index probe) is layered on by each caller."""
    is_en = (F.col("h_en") >= F.col("h_sql")) & (
        F.col("h_en") >= F.col("h_ops")
    )
    classifier_drop = F.col("wsum") < 100 * (2 * F.col("n_tokens") - 1)
    return (
        F.when(~is_en, F.lit("dropped:lang"))
        .when(F.col("n_tokens") < GATE_MIN_TOKENS, F.lit("dropped:quality"))
        .when(classifier_drop, F.lit("dropped:classifier"))
        .otherwise(F.lit("pass"))
    )
