"""Property fuzz for the substring-dedup family: random small corpora
through the REGISTERED query builders (reading a real parquet docs
table) vs a brute-force pure-Python reference implementing the same
spec — first occurrence ranked by (doc_id, pos), islands merged into
maximal spans, scrub keeps first occurrences."""

import random

import pytest

W = 8  # mirrors plans/text_pipeline.SUBSTR_W


def _ref_family(docs):
    """docs: {doc_id: text}. Returns (windows_stats, spans_stats,
    scrub) dicts keyed by doc_id, per the family's specs."""
    toks = {d: t.strip().split() for d, t in docs.items()}
    occ = {}  # win -> first (doc_id, pos)
    wins = {}  # doc_id -> [(pos, win)]
    for d in sorted(toks):
        tk = toks[d]
        wins[d] = [
            (i, " ".join(tk[i : i + W])) for i in range(len(tk) - W + 1)
        ] if len(tk) >= W else []
        for pos, wn in wins[d]:
            if wn not in occ or (d, pos) < occ[wn]:
                occ[wn] = (d, pos)
    windows_stats, spans_stats, scrub = {}, {}, {}
    for d, tk in toks.items():
        if not wins[d]:
            scrub[d] = (len(tk), " ".join(tk))
            continue
        dup_pos = [p for p, wn in wins[d] if occ[wn] != (d, p)]
        n = len(wins[d])
        windows_stats[d] = (n, len(dup_pos))
        # islands over consecutive duplicated positions
        spans = []
        for p in sorted(dup_pos):
            if spans and p == spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], p)
            else:
                spans.append((p, p))
        if spans:
            spans_stats[d] = (
                len(spans),
                max(e - s + W for s, e in spans),
                sum(e - s + W for s, e in spans),
            )
        covered = set()
        for s, e in spans:
            covered.update(range(s, e + W))
        kept = [t for i, t in enumerate(tk) if i not in covered]
        scrub[d] = (len(kept), " ".join(kept))
    return windows_stats, spans_stats, scrub


def _write_docs(spark, tmp_path, docs):
    rows = [
        (d, t, "en", "fuzz", len(t)) for d, t in sorted(docs.items())
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "sfdir")
    df.write.mode("overwrite").parquet(out + "/documents.parquet")
    return out


@pytest.mark.parametrize("seed", [7, 21])
def test_substring_family_matches_bruteforce(spark, tmp_path, seed):
    from falcon_metrics_etl_spark.plans.text_pipeline import (
        substring_dedup_scrub,
        substring_dedup_spans,
        substring_dedup_windows,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab => many repeats
    docs = {}
    boiler = " ".join(rng.choice(vocab) for _ in range(10))
    for d in range(14):
        n = rng.randint(2, 40)  # includes docs shorter than W
        body = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.5:  # splice a shared boilerplate passage
            at = rng.randint(0, len(body))
            body[at:at] = boiler.split()
        docs[d] = " ".join(body)

    sf = _write_docs(spark, tmp_path / str(seed), docs)
    ref_w, ref_s, ref_scrub = _ref_family(docs)

    got_w = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in substring_dedup_windows(spark, sf).collect()
    }
    assert got_w == ref_w

    got_s = {
        r["doc_id"]: (
            r["n_spans"], r["longest_span_tokens"], r["covered_tokens"]
        )
        for r in substring_dedup_spans(spark, sf).collect()
    }
    assert got_s == ref_s

    got_scrub = {
        r["doc_id"]: (r["n_tokens_kept"], r["clean_text"])
        for r in substring_dedup_scrub(spark, sf).collect()
    }
    assert got_scrub == ref_scrub
