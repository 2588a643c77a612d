"""BPE trainer/encoder semantics (functions/bpe.py) — the exact rules
the Spark plans and the generated DuckDB oracle both pin."""

from __future__ import annotations

from falcon_metrics_etl_spark.functions.bpe import (
    ENCODE_STAGES,
    MAX_WORD_LEN,
    encode_word,
    merge_word,
    pair_counts,
    train_bpe,
    word_to_tokens,
)


def test_merge_word_left_to_right_non_overlapping():
    # the classic run case: xxxx -> [xx, xx]; xxx -> [xx, x]
    assert merge_word(list("xxxx") , "x", "x") == ["xx", "xx"]
    assert merge_word(list("xxx"), "x", "x") == ["xx", "x"]
    assert merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert merge_word(["ab", "a", "b"], "a", "b") == ["ab", "ab"]
    assert merge_word(list("abc"), "c", "d") == ["a", "b", "c"]


def test_pair_counts_include_overlaps():
    c = pair_counts([(list("xxx"), 2)])
    assert c[("x", "x")] == 4  # two overlapping positions x freq 2


def test_train_on_sennrich_style_corpus():
    """lower/lowest-style toy vocab: the first merges pick the most
    frequent pairs with the deterministic tie-break."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(wf, 6)
    assert merges[0][:3] == (0, "e", "s")   # es: 9 (newest+widest)
    assert merges[1][:3] == (1, "es", "t")  # est: 9
    assert merges[2][:3] == (2, "est", "</w>")
    # ranks are dense and counts non-increasing only per-step validity
    assert [m[0] for m in merges] == list(range(len(merges)))


def test_train_tie_break_is_pair_ascending():
    # four pairs all count 3: lexicographically smallest wins, and
    # '</w>' (0x3C...) sorts before lowercase letters
    wf = [("ab", 3), ("ba", 3)]
    merges = train_bpe(wf, 2)
    assert merges[0][1:3] == ("a", "</w>")
    assert merges[1][1:3] == ("a", "b")


def test_encode_matches_training_segmentation():
    """Encoding a training word with the learned merges reproduces
    the segmentation training left it with, and detokenization is
    lossless (concat == word + </w>)."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
          ("xxxx", 4), ("mississippi", 2)]
    merges_full = train_bpe(wf, 24)
    pairs = [(m[1], m[2]) for m in merges_full]
    # replay training application to get the final vocab segmentation
    vocab = {w: word_to_tokens(w) for w, _ in wf}
    for left, right in pairs:
        vocab = {w: merge_word(t, left, right) for w, t in vocab.items()}
    for w, _ in wf:
        enc = encode_word(w, pairs)
        assert enc == vocab[w], w
        assert "".join(enc) == w + "</w>"
    # unseen words still encode with learned subwords, losslessly
    for w in ("lowest", "newer", "xxl", "zzz"):
        enc = encode_word(w, pairs)
        assert "".join(enc) == w + "</w>"
        assert len(enc) <= len(w) + 1


def test_encode_stage_bound_holds():
    """A word of MAX_WORD_LEN chars applies at most ENCODE_STAGES
    distinct ranks — the bound the oracle's static unroll relies on."""
    w = "a" * MAX_WORD_LEN
    merges = train_bpe([(w, 1)], 24)
    pairs = [(m[1], m[2]) for m in merges]
    ranks = {p: i for i, p in enumerate(pairs)}
    toks = word_to_tokens(w)
    stages = 0
    while True:
        best = None
        for pr in zip(toks, toks[1:]):
            rk = ranks.get(pr)
            if rk is not None and (best is None or rk < best):
                best = rk
        if best is None:
            break
        toks = merge_word(toks, *pairs[best])
        stages += 1
        assert stages <= ENCODE_STAGES
    assert encode_word(w, pairs) == toks


def test_byte_tokens_are_utf8_hex_pairs():
    from falcon_metrics_etl_spark.functions.bpe import word_to_byte_tokens

    assert word_to_byte_tokens("He") == ["48", "65"]
    assert word_to_byte_tokens(" the") == ["20", "74", "68", "65"]
    # multibyte chars split into their UTF-8 bytes — é = C3 A9
    assert word_to_byte_tokens("é") == ["C3", "A9"]


def test_byte_pretokenizer_gpt2_shapes():
    """The lookahead-free restatement keeps the GPT-2 properties that
    matter: leading space inside the token, contraction suffixes
    split, digit/letter/symbol runs separated."""
    import re

    from falcon_metrics_etl_spark.functions.bpe import BYTE_PRETOKEN_RE

    toks = re.findall(BYTE_PRETOKEN_RE, "He said: don't add 42 apples!")
    assert toks == [
        "He", " said", ":", " don", "'t", " add", " 42", " apples", "!",
    ]
    # every char lands in exactly one token (the alternation covers
    # the full alphabet)
    assert "".join(toks) == "He said: don't add 42 apples!"


def test_byte_level_train_matches_char_level_on_ascii_alphabet():
    """On a corpus where every word is a single repeated ASCII letter
    pair, byte-level merges are the hex image of char-level ones."""
    from falcon_metrics_etl_spark.functions.bpe import (
        train_bpe_seqs,
        word_to_byte_tokens,
    )

    vocab = [("ab", 5), ("abab", 3), ("ba", 2)]
    merges = train_bpe_seqs(
        ((word_to_byte_tokens(w), f) for w, f in vocab), n_merges=2
    )
    # most frequent pair: (61,62) = 'ab' seen 5 + 2*3 + 0 = 11 times
    assert merges[0][1:3] == ("61", "62")
    assert merges[0][3] == 11


def test_byte_bpe_roundtrip_property():
    """Property (hypothesis): byte-level encoding is a PARTITION of
    the word's UTF-8 hex — concatenating the output tokens always
    reproduces the full hex string exactly, for any corpus-trained
    merge table and any word (trained-on or unseen)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from falcon_metrics_etl_spark.functions.bpe import (
        encode_byte_word,
        train_bpe_seqs,
        word_to_byte_tokens,
    )

    words = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(words, st.integers(1, 9)), min_size=1,
                    max_size=8), words)
    def check(vocab, probe):
        merges = train_bpe_seqs(
            ((word_to_byte_tokens(w), f) for w, f in vocab), n_merges=8
        )
        pairs = [(l, r) for _, l, r, _ in merges]
        for w in [probe] + [v[0] for v in vocab]:
            toks = encode_byte_word(w, pairs)
            assert "".join(toks) == w.encode("utf-8").hex().upper()
            # every token is a whole number of bytes
            assert all(len(t) % 2 == 0 and len(t) >= 2 for t in toks)

    check()
