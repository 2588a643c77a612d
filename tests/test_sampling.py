"""Sampling/packing operators: append stability, exactness, packing
bounds (the oracle queries check cross-engine value parity)."""

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.sampling import (
    deterministic_split,
    pack_sequences,
    sample_stratified_exact,
)

SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_assignment_stable_under_append(spark):
    """Growing the corpus must never move an existing row to another
    split — membership depends only on the key."""
    old = spark.createDataFrame(
        [(f"doc{i}",) for i in range(500)], "k string"
    )
    new = spark.createDataFrame(
        [(f"doc{i}",) for i in range(800)], "k string"
    )
    a = {r["k"]: r["split"] for r in deterministic_split(old, "k", SPLITS).collect()}
    b = {r["k"]: r["split"] for r in deterministic_split(new, "k", SPLITS).collect()}
    assert all(b[k] == v for k, v in a.items())
    # and fractions are roughly honored on the larger set
    n = len(b)
    train = sum(1 for v in b.values() if v == "train")
    assert 0.7 < train / n < 0.9


def test_stratified_sample_exact_counts_and_determinism(spark):
    df = spark.createDataFrame(
        [(f"d{i}", ["en", "fr", "de"][i % 3]) for i in range(90)]
        + [("only1", "xx")],
        "k string, lang string",
    )
    out1 = sample_stratified_exact(df, ["lang"], "k", 7)
    counts = {
        r["lang"]: r["n"]
        for r in out1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"en": 7, "fr": 7, "de": 7, "xx": 1}
    out2 = sample_stratified_exact(df.repartition(7), ["lang"], "k", 7)
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))


def test_pack_sequences_budget_overflow_bounded(spark):
    df = spark.createDataFrame(
        [(f"d{i}", "en", (i * 37) % 900 + 50) for i in range(200)],
        "k string, lang string, toks int",
    )
    packed = pack_sequences(df, "k", "toks", 1000, pack_key_cols=["lang"])
    per_bin = (
        packed.groupBy("lang", "pack_id")
        .agg(F.sum("toks").alias("total"), F.max("toks").alias("biggest"))
        .collect()
    )
    assert len(per_bin) > 1
    for r in per_bin:
        # a bin exceeds the budget only by (part of) its last document
        assert r["total"] - r["biggest"] < 1000
    # every doc assigned exactly once
    assert packed.count() == 200


def test_epoch_shuffle_is_deterministic_dense_permutation(spark):
    """Per (epoch, shard): positions are dense 0..n-1; the assignment
    is a pure function of (key, epoch) — rerun-identical — and epochs
    produce genuinely different orders."""
    from pyspark.sql import functions as F

    from falcon_metrics_etl_spark.operators.sampling import epoch_shuffle

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    out = epoch_shuffle(docs, "doc_id", (0, 1), n_shards=8)
    rows = out.collect()
    assert len(rows) == 1000  # 500 docs x 2 epochs

    # dense positions per (epoch, shard)
    from collections import defaultdict
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[(r["epoch"], r["shard"])].append(r["position"])
    for ps in by_shard.values():
        assert sorted(ps) == list(range(len(ps)))

    # deterministic across reruns
    again = {(r["doc_id"], r["epoch"]): (r["shard"], r["position"])
             for r in epoch_shuffle(docs, "doc_id", (0, 1), 8).collect()}
    first = {(r["doc_id"], r["epoch"]): (r["shard"], r["position"])
             for r in rows}
    assert first == again

    # epochs reshuffle: the two epoch assignments must differ broadly
    moved = sum(
        1 for d in range(500)
        if first[(d, 0)] != first[(d, 1)]
    )
    assert moved > 400


def test_weighted_sample_wor_properties(spark):
    """Efraimidis-Spirakis invariants: the selected set matches a
    plain-Python recomputation of the top-k by ln(u)/w; appending
    unrelated rows never evicts differently than the algorithm says;
    zero/negative weights are excluded."""
    import hashlib
    import math

    from falcon_metrics_etl_spark.operators.sampling import (
        weighted_sample_wor,
    )

    rows = [(i, (i * 37) % 500 + 1) for i in range(400)]
    rows += [(1000, 0), (1001, -5)]  # excluded weights
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = weighted_sample_wor(df, "doc_id", "n_chars", 25).collect()
    assert len(got) == 25

    def key(doc_id, w):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        u = ((h % 1000000) + 1) / 1000001.0
        return math.log(u) / w

    ref = sorted(
        ((key(d, w), d) for d, w in rows if w > 0), reverse=True
    )[:25]
    assert [r["doc_id"] for r in got] == [d for _, d in ref]
    # per-row keys agree with the formula
    for r in got:
        assert abs(r["sample_key"] - key(r["doc_id"], r["n_chars"])) < 1e-12
    # append-stability: adding rows with losing keys changes nothing
    more = df.union(
        spark.createDataFrame(
            [(5000 + i, 1) for i in range(50)], "doc_id long, n_chars long"
        )
    )
    got2 = weighted_sample_wor(more, "doc_id", "n_chars", 25).collect()
    winners2 = [r["doc_id"] for r in got2]
    ref2 = sorted(
        ((key(d, w), d)
         for d, w in rows + [(5000 + i, 1) for i in range(50)] if w > 0),
        reverse=True,
    )[:25]
    assert winners2 == [d for _, d in ref2]


def test_greedy_prefix_two_phase_matches_one_window(spark, sf_smoke):
    """The size-gated two-phase greedy-prefix selection (r16) must be
    row-identical to the exact one-window form on the same input —
    force each path via the threshold conf and compare."""
    from falcon_metrics_etl_spark.plans.sampling_queries import (
        _MIX_TWO_PHASE_MIN_BYTES_CONF,
        domain_mix_token_budget,
        domain_temperature_mix,
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    conf = spark.conf
    old = conf.get(_MIX_TWO_PHASE_MIN_BYTES_CONF, None)
    try:
        conf.set(_MIX_TWO_PHASE_MIN_BYTES_CONF, str(1 << 60))  # 1-window
        a1 = rows(domain_mix_token_budget(spark, sf_smoke))
        b1 = rows(domain_temperature_mix(spark, sf_smoke))
        conf.set(_MIX_TWO_PHASE_MIN_BYTES_CONF, "0")  # two-phase
        a2 = rows(domain_mix_token_budget(spark, sf_smoke))
        b2 = rows(domain_temperature_mix(spark, sf_smoke))
    finally:
        if old is None:
            conf.unset(_MIX_TWO_PHASE_MIN_BYTES_CONF)
        else:
            conf.set(_MIX_TWO_PHASE_MIN_BYTES_CONF, old)
    assert a1 == a2
    assert b1 == b2
    assert len(a1) > 0 and len(b1) > 0
