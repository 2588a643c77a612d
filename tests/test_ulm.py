"""Unigram-LM tokenizer semantics (functions/ulm.py) + a no-Spark
DuckDB replay of the generated EM oracle on a synthetic corpus with a
RICHER vocabulary than the testdata fixture (31 distinct words) — the
oracle stages must agree with the Python trainer piece-for-piece on
overlapping substrings, EM pruning and Viterbi tie-breaks."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from falcon_metrics_etl_spark.functions.ulm import (
    ULM_MAX_PIECE,
    ULM_SEED_CAP,
    ULM_UNK_COST,
    ULM_UNK_PIECE,
    costs_of,
    encode_stats,
    q_cost,
    seed_pieces,
    train_ulm,
    viterbi,
)


def test_seed_counts_are_freq_weighted_with_multiplicity():
    vocab = seed_pieces([("aaa", 2), ("ab", 3)])
    # 'a' occurs 3x in 'aaa' (freq 2) + 1x in 'ab' (freq 3) = 9
    assert vocab["a"] == 9
    assert vocab["aa"] == 4      # two overlapping occurrences x freq 2
    assert vocab["aaa"] == 2
    assert vocab["ab"] == 3
    assert vocab["b"] == 3


def test_seed_respects_max_piece_len():
    word = "x" * (ULM_MAX_PIECE + 3)
    vocab = seed_pieces([(word, 1)])
    assert max(len(p) for p in vocab) == ULM_MAX_PIECE


def test_viterbi_minimizes_cost_then_tokens():
    # 'ab' as one piece (cost 8) beats 'a'+'b' (5+6=11)
    costs = {"a": 5, "b": 6, "ab": 8}
    (c, n, u), segs = viterbi("ab", costs)
    assert (c, n, u) == (8, 1, 0) and segs == ["ab"]
    # equal cost -> fewer tokens wins
    costs = {"a": 5, "b": 5, "ab": 10}
    (c, n, u), segs = viterbi("ab", costs)
    assert (c, n, u) == (10, 1, 0) and segs == ["ab"]


def test_viterbi_backtrace_tie_breaks_smallest_start():
    # 'aba' with cost('ab')=cost('ba') and shared 'a': two equal-value
    # segmentations [ab,a] vs [a,ba]; the END-FIRST backtrace at
    # pos=3 must take the SMALLEST start, i.e. piece 'ba' (st=2)
    # over 'a' (st=3) — pinning [a, ba].
    costs = {"a": 5, "b": 9, "ab": 7, "ba": 7}
    (c, n, u), segs = viterbi("aba", costs)
    assert (c, n, u) == (12, 2, 0)
    assert segs == ["ba", "a"]  # backtrace order: last piece first


def test_viterbi_unk_fallback_counts_unks():
    costs = {"a": 5}
    res = viterbi("axa", costs, allow_unk=True)
    assert res is not None
    (c, n, u), segs = res
    assert n == 3 and u == 1
    assert c == 10 + ULM_UNK_COST
    assert segs == ["a", ULM_UNK_PIECE, "a"]
    assert viterbi("axa", costs, allow_unk=False) is None


def test_unk_never_outbids_a_real_piece():
    costs = {"a": ULM_UNK_COST - 1}
    (_c, n, u), segs = viterbi("a", costs, allow_unk=True)
    assert u == 0 and segs == ["a"]


def test_train_prunes_unused_multis_keeps_singles():
    rows = train_ulm([("abab", 50), ("cd", 1)])
    pieces = {p for p, _c, _k in rows}
    # singles always survive
    assert {"a", "b", "c", "d"} <= pieces
    counts = {p: c for p, c, _k in rows}
    # 'abab' segments via a multi piece; every kept multi was used
    for p, c, _k in rows:
        if len(p) >= 2:
            assert c > 0
    # determinism
    assert rows == train_ulm([("abab", 50), ("cd", 1)])
    # costs are the add-one-smoothed quantized -ln(p)
    tot = sum(c + 1 for c in counts.values())
    for p, c, k in rows:
        assert k == q_cost(c, tot)


def test_encode_stats_matches_viterbi():
    rows = train_ulm([("hello", 10), ("help", 5)])
    costs = {p: k for p, _c, k in rows}
    n, u = encode_stats("hello", costs)
    (_c, vn, vu), _segs = viterbi("hello", costs, allow_unk=True)
    assert (n, u) == (vn, vu)
    # OOV chars count as unks
    n, u = encode_stats("zzz", costs)
    assert n == 3 and u == 3


@pytest.mark.parametrize("n_docs", [40])
def test_duckdb_oracle_replays_python_em(n_docs):
    """The generated EM-replay SQL and the Python trainer must agree
    on a synthetic corpus with overlapping substrings, repeated
    stems, max-length words and punctuation variety."""
    from falcon_metrics_etl_spark.plans.ulm import _TRAIN_ORACLE

    import re
    from collections import Counter

    stems = [
        "interoperability",  # > MAX_WORD_LEN, excluded by the filter
        "reconfigure", "reconfigured", "configure", "config",
        "banana", "bandana", "ban", "anna", "nab",
        "stream", "streaming", "streamer", "upstream",
        "x" * 15, "ababababab", "zq", "q",
    ]
    docs = []
    for d in range(n_docs):
        toks = [stems[(d * 7 + i) % len(stems)] for i in range(1 + d % 9)]
        docs.append({"doc_id": d, "text": " ".join(toks)})
    pdf = pd.DataFrame(docs)

    words = Counter()
    for t in pdf["text"]:
        for w in re.split(r"\s+", t.strip()):
            if 1 <= len(w) <= 15 and not re.search(r"[\x00-\x1f\x7f]", w):
                words[w] += 1
    sketch = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:4096]
    py = {p: (c, k) for p, c, k in train_ulm(sketch)}

    con = duckdb.connect()
    con.register("documents", pdf)
    db = {p: (c, k) for p, c, k in con.execute(_TRAIN_ORACLE).fetchall()}
    assert set(py) == set(db)
    assert all(py[p] == db[p] for p in py)
    # the corpus genuinely exercises multi-char pieces
    assert any(len(p) >= 3 for p in py)
    assert len(py) > 30


def test_seed_cap_is_applied_deterministically():
    # many distinct multi-char substrings; cap must keep the top by
    # (count DESC, piece ASC)
    wf = [(f"w{i:03d}", 1) for i in range(500)]
    vocab = seed_pieces(wf)
    multis = [p for p in vocab if len(p) >= 2]
    assert len(multis) <= ULM_SEED_CAP


# ---------------------------------------------------------------------------
# Property tests (hypothesis): the Viterbi DP must equal brute-force
# minimization over ALL segmentations for short words
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


def _brute_best(word, costs, allow_unk):
    """Enumerate every segmentation of ``word`` (2^(L-1) cut masks),
    return the min (cost, n_tokens, n_unk) tuple, or None."""
    L = len(word)
    best = None
    for mask in range(1 << max(0, L - 1)):
        cuts = [0] + [i for i in range(1, L) if mask >> (i - 1) & 1] + [L]
        tot = n = u = 0
        ok = True
        for a, b in zip(cuts, cuts[1:]):
            piece = word[a:b]
            c = costs.get(piece)
            if c is None:
                if allow_unk and b - a == 1:
                    tot += ULM_UNK_COST
                    n += 1
                    u += 1
                    continue
                ok = False
                break
            if b - a > ULM_MAX_PIECE:
                ok = False
                break
            tot += c
            n += 1
        if ok:
            v = (tot, n, u)
            if best is None or v < best:
                best = v
    return best


@settings(max_examples=150, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=8),
    pieces=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=3),
        st.integers(min_value=1, max_value=10_000_000),
        max_size=12,
    ),
    unk=st.booleans(),
)
def test_viterbi_matches_bruteforce(word, pieces, unk):
    costs = dict(pieces)
    # guarantee coverage when unk is off (singles always in a real vocab)
    if not unk:
        for ch in set(word):
            costs.setdefault(ch, 999_999)
    res = viterbi(word, costs, allow_unk=unk)
    exp = _brute_best(word, costs, unk)
    assert (res is None) == (exp is None)
    if res is not None:
        assert res[0] == exp
        # the backtraced segmentation reproduces the optimal value
        tot = sum(
            ULM_UNK_COST if p == ULM_UNK_PIECE else costs[p]
            for p in res[1]
        )
        n_unk = sum(1 for p in res[1] if p == ULM_UNK_PIECE)
        assert (tot, len(res[1]), n_unk) == res[0]
        assert "".join(reversed(
            [ch if p == ULM_UNK_PIECE else p
             for p, ch in zip(res[1], _reconstruct_chars(word, res[1]))]
        )) == word


def _reconstruct_chars(word, segs_end_first):
    """For UNK pieces, the covered char (segs are end-first)."""
    out = []
    pos = len(word)
    for p in segs_end_first:
        ln = 1 if p == ULM_UNK_PIECE else len(p)
        out.append(word[pos - ln : pos])
        pos -= ln
    return out
