"""Byte-pair encoding — trainer + encoder for the tokenization layer.

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units" — public algorithm): train on the
WORD-FREQUENCY vocabulary (not the raw corpus), repeatedly merging
the most frequent adjacent symbol pair; encode any word by applying
the learned merges lowest-rank-first.

Exact semantics, pinned identically in this module, the Spark plans
(plans/bpe.py) and the generated DuckDB oracle:

- a word tokenizes to its characters plus a ``</w>`` end marker;
- pair COUNTS include overlapping occurrences ("xxx" counts (x,x)
  twice), weighted by word frequency;
- pair APPLICATION merges occurrences LEFT-TO-RIGHT, non-overlapping
  ("xxxx" -> [xx, xx]);
- selection tie-break: (count DESC, left ASC, right ASC);
- encoding applies the single lowest-rank pair present (all its
  occurrences), then re-selects — equivalent to rank-ordered
  application because a pair containing a merged token is always
  learned AFTER the merge that created the token, so its rank is
  strictly higher.

Scale design (the part that matters at 100 TB): training state is the
word-frequency vocabulary — a bounded sketch of the corpus (capped at
``VOCAB_CAP`` most frequent words, ``MAX_WORD_LEN``-char words only,
the standard pre-tokenization filter). The distributed work is the
word count and the encode pass; the merge loop runs over the capped
vocab inside ONE executor task (``applyInPandas`` over a literal
group — no driver collect, the plan stays lazy). Encoding is
dictionary-style: DISTINCT words encode once, documents join the
word -> token-count dictionary back (broadcast-sized).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Optional, Sequence

N_MERGES = 24
VOCAB_CAP = 4096
MAX_WORD_LEN = 15   # longer "words" (URLs, blobs) are excluded from
# training AND stats on both engines; also bounds the oracle's static
# encode-stage unroll (<= MAX_WORD_LEN + 1 tokens per word)
ENCODE_STAGES = MAX_WORD_LEN + 1
END_TOKEN = "</w>"

# ---- byte-level variant (GPT-2-shaped) ------------------------------------
# Pre-tokenizer: contraction suffixes, optionally-space-prefixed
# letter/digit/symbol runs, whitespace runs — the standard byte-level
# BPE split (Radford et al. 2019, public gpt-2 encoder.py pattern),
# restated lookahead-free with explicit ASCII classes so Java regex
# (Spark) and RE2 (DuckDB) agree byte-for-byte: RE2 lacks the
# upstream pattern's `\s+(?!\S)` lookahead, and the engines' \s
# classes differ at \x0B.
BYTE_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^A-Za-z0-9 \t\n\r\f]+"
    r"|[ \t\n\r\f]+"
)
# pre-tokens longer than this many UTF-8 bytes (blobs, URLs) are
# excluded from training on both engines — the byte-level analogue of
# MAX_WORD_LEN, and the bound on tokens per word
BYTE_TOKEN_MAX_BYTES = 16


def word_to_tokens(word: str) -> list[str]:
    return list(word) + [END_TOKEN]


def merge_word(toks: Sequence[str], a: str, b: str) -> list[str]:
    """Merge every (a, b) occurrence left-to-right, non-overlapping."""
    out: list[str] = []
    i = 0
    n = len(toks)
    while i < n:
        if i + 1 < n and toks[i] == a and toks[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def pair_counts(vocab: Iterable[tuple[Sequence[str], int]]) -> Counter:
    """Adjacent-pair counts over (tokens, freq) — overlapping pairs
    all count (the Sennrich get_stats convention)."""
    c: Counter = Counter()
    for toks, freq in vocab:
        for x, y in zip(toks, toks[1:]):
            c[(x, y)] += freq
    return c


def train_bpe_seqs(
    seq_freqs: Iterable[tuple[Sequence[str], int]], n_merges: int = N_MERGES
) -> list[tuple[int, str, str, int]]:
    """Learn up to ``n_merges`` merges from pre-tokenized (symbol
    sequence, freq) pairs — the alphabet-agnostic core shared by the
    char-level trainer (``train_bpe``) and the byte-level variant
    (symbols = uppercase hex byte pairs, no end marker). Returns
    [(rank, left, right, pair_count)] in rank order; stops early when
    no adjacent pair remains."""
    vocab = [(list(toks), f) for toks, f in seq_freqs]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts = pair_counts(vocab)
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, cnt))
        vocab = [(merge_word(t, left, right), f) for t, f in vocab]
    return merges


def train_bpe(
    word_freqs: Iterable[tuple[str, int]], n_merges: int = N_MERGES
) -> list[tuple[int, str, str, int]]:
    """Learn up to ``n_merges`` merges from (word, freq) pairs.
    Returns [(rank, left, right, pair_count)] in rank order; stops
    early when no adjacent pair remains."""
    return train_bpe_seqs(
        ((word_to_tokens(w), f) for w, f in word_freqs), n_merges
    )


def word_to_byte_tokens(word: str) -> list[str]:
    """Byte-level alphabet: the word's UTF-8 bytes as uppercase hex
    pairs ('He' -> ['48', '65']). No end-of-word marker — the
    GPT-2-style pre-tokenizer keeps the leading space INSIDE the
    token (' the' starts with '20'), which is what marks word
    boundaries at byte level."""
    h = word.encode("utf-8").hex().upper()
    return [h[i : i + 2] for i in range(0, len(h), 2)]


def encode_tokens(
    toks: Sequence[str],
    merges: Sequence[tuple[str, str]],
    ranks: Optional[dict] = None,
) -> list[str]:
    """Encode a pre-split symbol sequence with rank-ordered
    ``merges`` [(left, right)]: repeatedly apply the lowest-rank pair
    present (all occurrences) — the alphabet-agnostic core shared by
    the char-level and byte-level encoders."""
    if ranks is None:
        ranks = {pair: i for i, pair in enumerate(merges)}
    toks = list(toks)
    while True:
        best = None
        for pair in zip(toks, toks[1:]):
            rk = ranks.get(pair)
            if rk is not None and (best is None or rk < best):
                best = rk
        if best is None:
            return toks
        left, right = merges[best]
        toks = merge_word(toks, left, right)


def encode_word(
    word: str,
    merges: Sequence[tuple[str, str]],
    ranks: Optional[dict] = None,
) -> list[str]:
    """Char-level encode: chars + ``</w>`` end marker."""
    return encode_tokens(word_to_tokens(word), merges, ranks)


def encode_byte_word(
    word: str,
    merges: Sequence[tuple[str, str]],
    ranks: Optional[dict] = None,
) -> list[str]:
    """Byte-level encode: UTF-8 hex-pair alphabet, no end marker."""
    return encode_tokens(word_to_byte_tokens(word), merges, ranks)
