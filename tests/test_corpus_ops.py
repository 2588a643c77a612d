"""Unit tests for the corpus-governance layer: shingle construction
edge cases, PII redaction determinism, repetition scoring semantics.
(The DuckDB oracle gate covers end-to-end correctness; these pin the
building blocks against regressions.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions import text as TX


def _shingles(spark, text: str, n: int):
    df = spark.createDataFrame([(text,)], ["text"])
    # materialized token column, as every call site does
    out = df.select(TX.tokens(F.col("text")).alias("tk")).select(
        TX.word_shingles(F.col("tk"), n).alias("s")
    )
    return out.collect()[0].s


def test_word_shingles_basic_trigrams(spark):
    assert _shingles(spark, "a b c d", 3) == ["a b c", "b c d"]


def test_word_shingles_exact_length(spark):
    assert _shingles(spark, "a b c", 3) == ["a b c"]


def test_word_shingles_shorter_than_n_is_empty(spark):
    assert _shingles(spark, "a b", 3) == []
    assert _shingles(spark, "a", 2) == []


def test_word_shingles_bigrams_preserve_order_and_duplicates(spark):
    assert _shingles(spark, "x y x y", 2) == ["x y", "y x", "x y"]


def test_repetition_run_length_equals_top_bigram_count(spark):
    # doc with a dominant repeated bigram: 'x y' appears 3 times among
    # 6 bigrams -> top_bigram_frac = 0.5
    from falcon_metrics_etl_spark.plans.registry import all_queries  # noqa: F401
    from falcon_metrics_etl_spark.plans.corpus_ops import (
        repetition_quality_flags,
    )
    import falcon_metrics_etl_spark.sources.tables as tables

    df = spark.createDataFrame(
        [(1, "x y x y x y z")], "doc_id long, text string"
    )
    orig = tables.load_table
    try:
        tables.load_table = lambda s, d, n: df
        # plans module imported load_table by value — patch there too
        import falcon_metrics_etl_spark.plans.corpus_ops as co

        co_orig = co.load_table
        co.load_table = lambda s, d, n: df
        try:
            row = repetition_quality_flags(spark, "ignored").collect()[0]
        finally:
            co.load_table = co_orig
    finally:
        tables.load_table = orig
    assert row.n_tokens == 7
    assert abs(row.top_bigram_frac - 0.5) < 1e-9
    # distinct ratio 3/7
    assert abs(row.distinct_token_ratio - round(3 / 7, 4)) < 1e-9
    assert bool(row.is_repetitive) is True


def test_pii_redaction_is_deterministic_and_complete(spark):
    from falcon_metrics_etl_spark.plans.corpus_ops import pii_redaction_audit
    import falcon_metrics_etl_spark.plans.corpus_ops as co

    df = spark.createDataFrame(
        [(3, "hello world"), (4, "no pii here")], "doc_id long, text string"
    )
    co_orig = co.load_table
    co.load_table = lambda s, d, n: df
    try:
        rows = {r.doc_id: r for r in pii_redaction_audit(spark, "x").collect()}
    finally:
        co.load_table = co_orig
    # doc 3 gets the synthesized email + cc (doc_id % 3 == 0) + phone
    assert rows[3].n_emails == 2 and rows[3].n_phones == 1
    assert rows[4].n_emails == 1 and rows[4].n_phones == 1
    # exact post-redaction text for doc 4: the email regex consumes the
    # whole "user4@example.com" token, the phone regex "+1-555-004-0004"
    assert rows[4].redacted_len == len("no pii here contact <EMAIL> or <PHONE>")


def test_chunk_dedup_rebuild_semantics(spark):
    """First corpus-wide occurrence of a chunk survives; later copies
    drop; docs rebuild from surviving chunks in original order."""
    import hashlib

    import falcon_metrics_etl_spark.plans.corpus_ops as co

    a_tokens = " ".join(f"w{i}" for i in range(16))       # chunk A
    b_tokens = " ".join(f"v{i}" for i in range(16))       # chunk B
    # doc 1 = A + B; doc 2 = A + tail (A is a dup of doc 1's chunk)
    df = spark.createDataFrame(
        [
            (1, a_tokens + " " + b_tokens),
            (2, a_tokens + " unique tail here"),
        ],
        "doc_id long, text string",
    )
    orig = co.load_table
    co.load_table = lambda s, d, n: df
    try:
        rows = {
            r["doc_id"]: r
            for r in co.chunk_dedup_rebuild(spark, "ignored").collect()
        }
    finally:
        co.load_table = orig
    assert rows[1]["n_chunks"] == 2 and rows[1]["n_kept"] == 2
    # doc 2: chunk A deduped away, only the 3-token tail chunk kept
    assert rows[2]["n_chunks"] == 2 and rows[2]["n_kept"] == 1
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert rows[1]["rebuilt_fp"] == md5(a_tokens + " " + b_tokens)
    assert rows[2]["rebuilt_fp"] == md5("unique tail here")


def test_hashed_ngram_classifier_matches_python_reference(spark):
    """The classifier forward pass (hash-trick bucket -> deterministic
    milli-weight -> mean-pool -> sigmoid) recomputed row-by-row in
    plain Python: wsum, n_features, probability and the exact integer
    decision form all agree."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from falcon_metrics_etl_spark.functions import text as TX

    texts = [
        "alpha beta gamma delta",
        "the quick brown fox jumps over the lazy dog",
        "one",          # single token: no bigrams
        "x y",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            TX.hashed_ngram_weight_sum(TX.tokens(F.col("text"))).alias("wsum"),
            F.size(
                TX.hashed_ngram_features(TX.tokens(F.col("text")))
            ).alias("nf"),
        ).collect()
    }

    def w(feature: str) -> int:
        h = int(hashlib.md5(feature.encode()).hexdigest()[:15], 16)
        return ((h % TX.QC_BUCKETS) * TX.QC_MULT) % 2001 - 1000

    for i, t in enumerate(texts):
        toks = t.split()
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        wsum = sum(w(f) for f in feats)
        assert got[i]["wsum"] == wsum, (i, t)
        assert got[i]["nf"] == len(feats) == 2 * len(toks) - 1
        # integer decision form == sign of the true logit
        logit = wsum / (len(feats) * 1000.0) + TX.QC_BIAS
        assert (wsum >= -TX.QC_BIAS * 1000 * len(feats)) == (logit >= 0)
        # and the probability the registered query would emit
        prob = 1.0 / (1.0 + math.exp(-logit))
        assert 0.0 < prob < 1.0


def test_bigram_surprisal_interpolation_backoff(spark):
    """On a corpus where one bigram is frequent and another unseen,
    the interpolated score ranks the seen-bigram doc strictly less
    surprising, and every per-position term matches a plain-Python
    recomputation of 0.75*ML + 0.25*add-one-unigram in micro-nats."""
    import math

    from falcon_metrics_etl_spark.plans import corpus_ops as co

    texts = {
        1: "a b a b a b",   # bigrams (a,b) x3, (b,a) x2
        2: "a c",           # bigram (a,c) unseen elsewhere
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    orig = co.load_table
    co.load_table = lambda s, d, n: df
    try:
        rows = {
            r["doc_id"]: r
            for r in co.bigram_surprisal_scores(spark, "ignored").collect()
        }
    finally:
        co.load_table = orig

    # python reference
    toks = {i: t.split() for i, t in texts.items()}
    uni: dict = {}
    bi: dict = {}
    for ts in toks.values():
        for w_ in ts:
            uni[w_] = uni.get(w_, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n = sum(uni.values())
    v = len(uni)

    def score(ts):
        qs = []
        for i, w_ in enumerate(ts):
            if i == 0:
                qs.append(round(math.log((n + v) / (uni[w_] + 1)) * 1e6))
            else:
                p = (bi.get((ts[i - 1], w_), 0) / uni[ts[i - 1]]) * 0.75 \
                    + ((uni[w_] + 1) / (n + v)) * 0.25
                qs.append(round(-math.log(p) * 1e6))
        return sum(qs) / len(ts) / 1e6

    for i in texts:
        assert abs(rows[i]["avg_surprisal_nats"] - score(toks[i])) < 1e-9
        assert rows[i]["n_tokens"] == len(toks[i])
    assert rows[1]["avg_surprisal_nats"] < rows[2]["avg_surprisal_nats"]


def test_fast_classifier_twins_invariants(spark, sf_smoke):
    """The xxhash64 fast twins (quality_classifier_scores_fast,
    corpus_cleaning_audit_fast) register rows-only — this pins the
    cross-twin invariants an oracle can't: identical doc sets and
    n_features, probabilities in range, and audit statuses that agree
    on every gate EXCEPT through the classifier verdict (lang/quality
    drops are hash-independent; a doc may only move between kept /
    dropped:classifier / dropped:duplicate)."""
    from falcon_metrics_etl_spark.plans.registry import all_queries

    reg = all_queries()
    md5_scores = {
        r["doc_id"]: r
        for r in reg["quality_classifier_scores"].spark(spark, sf_smoke).collect()
    }
    fast_scores = {
        r["doc_id"]: r
        for r in reg["quality_classifier_scores_fast"].spark(spark, sf_smoke).collect()
    }
    assert set(md5_scores) == set(fast_scores) and md5_scores
    for k, f in fast_scores.items():
        assert f["n_features"] == md5_scores[k]["n_features"]
        assert 0.0 <= f["quality_prob"] <= 1.0
        assert f["quality_label"] == ("keep" if f["quality_prob"] >= 0.5 else "drop")

    md5_audit = {
        r["doc_id"]: r["status"]
        for r in reg["corpus_cleaning_audit"].spark(spark, sf_smoke).collect()
    }
    fast_audit = {
        r["doc_id"]: r["status"]
        for r in reg["corpus_cleaning_audit_fast"].spark(spark, sf_smoke).collect()
    }
    assert set(md5_audit) == set(fast_audit)
    classifier_reachable = {"kept", "dropped:classifier", "dropped:duplicate"}
    for k in md5_audit:
        if md5_audit[k] != fast_audit[k]:
            assert md5_audit[k] in classifier_reachable, (k, md5_audit[k])
            assert fast_audit[k] in classifier_reachable, (k, fast_audit[k])
