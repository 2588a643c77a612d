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


def train_bpe(
    word_freqs: Iterable[tuple[str, int]], n_merges: int = N_MERGES
) -> list[tuple[int, str, str, int]]:
    """Learn up to ``n_merges`` merges from (word, freq) pairs.
    Returns [(rank, left, right, pair_count)] in rank order; stops
    early when no adjacent pair remains."""
    vocab = [(word_to_tokens(w), f) for w, f in word_freqs]
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


def encode_word(
    word: str,
    merges: Sequence[tuple[str, str]],
    ranks: Optional[dict] = None,
) -> list[str]:
    """Encode one word with rank-ordered ``merges`` [(left, right)]:
    repeatedly apply the lowest-rank pair present (all occurrences)."""
    if ranks is None:
        ranks = {pair: i for i, pair in enumerate(merges)}
    toks = word_to_tokens(word)
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
