"""Unigram-LM tokenizer (SentencePiece-style) — trainer + Viterbi
encoder for the tokenization layer's second production family
(r10 verdict #1; BPE is plans/bpe.py).

Algorithm (Kudo 2018, "Subword Regularization", public; SentencePiece
trainer): seed a candidate piece vocabulary from corpus substrings,
then iterate EM — segment the corpus with the current piece
log-probabilities, re-estimate probabilities from usage counts, prune
unused pieces. This implementation is the deterministic hard-EM
(Viterbi-EM) variant: the E-step uses the single best segmentation
per word rather than expected counts over all segmentations — the
standard deterministic simplification, chosen here because every EM
iteration must be REPLAYABLE as DuckDB CTE stages for the oracle.

Exact semantics, pinned identically in this module, the Spark plans
(plans/ulm.py) and the generated DuckDB oracle:

- training operates on the SAME bounded word sketch as BPE: top
  ``VOCAB_CAP`` most-frequent words of <= ``MAX_WORD_LEN`` chars, no
  ASCII control chars (functions/bpe.py constants);
- seed pieces: every substring of sketch words up to
  ``ULM_MAX_PIECE`` chars, counted with multiplicity and weighted by
  word frequency; ALL single chars are kept, multi-char candidates
  keep the top ``ULM_SEED_CAP`` by (count DESC, piece ASC);
- piece costs are QUANTIZED integer negative log-probs with add-one
  smoothing: cost = floor(-ln((cnt + 1) / sum(cnt + 1)) * 1e6 + 0.5)
  — integers end to end, so engine/oracle parity never rides on a
  float hash (ln itself is bit-identical between CPython and DuckDB
  on this libm, verified, and the 1e-6 quantization makes the margin
  astronomically safe);
- Viterbi DP minimizes the tuple (total cost, n_tokens, n_unk)
  lexicographically (additive tuple weights keep Bellman valid);
  backtrace resolves value ties by smallest piece START, which pins
  the segmentation — and therefore the E-step counts — uniquely;
- M-step: every single-char piece survives (cost re-smoothed even at
  count 0); multi-char pieces survive iff their Viterbi usage count
  is > 0;
- after ``ULM_N_EM`` iterations the final vocabulary is the surviving
  pieces with their last-E-step counts and re-smoothed costs;
- encoding covers out-of-vocabulary chars with a per-char UNK edge of
  fixed cost ``ULM_UNK_COST`` (larger than any achievable real piece
  cost, so UNK is used only when no piece covers a position).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Iterable, Optional

ULM_MAX_PIECE = 6       # max piece length (chars)
ULM_SEED_CAP = 2048     # multi-char seed candidates kept
ULM_N_EM = 3            # EM iterations
ULM_Q = 1_000_000       # quantization scale for -ln(p) costs
# UNK cost: any real piece cost is <= floor(ln(sum(cnt+1))*1e6), and
# the smoothed mass sum is bounded far below e^30 (~1e13) on any
# realistic sketch, so UNK never outbids a real edge
ULM_UNK_COST = 30_000_000
ULM_UNK_PIECE = "\x01"  # sentinel; words exclude ASCII control chars


def q_cost(cnt: int, tot: int) -> int:
    """Quantized integer cost of a piece with smoothed count ``cnt+1``
    out of smoothed total ``tot``: floor(-ln((cnt+1)/tot)*1e6 + 0.5).
    Mirrored by the oracle's
    CAST(FLOOR(-ln((cnt+1)::DOUBLE / tot) * 1000000 + 0.5) AS BIGINT)."""
    return int(math.floor(-math.log((cnt + 1) / tot) * ULM_Q + 0.5))


def seed_pieces(word_freqs: Iterable[tuple[str, int]]) -> dict[str, int]:
    """Seed candidate vocabulary: substring counts (with multiplicity,
    freq-weighted) up to ULM_MAX_PIECE chars; all single chars + the
    top ULM_SEED_CAP multi-char candidates by (count DESC, piece ASC)."""
    subs: Counter = Counter()
    for w, f in word_freqs:
        L = len(w)
        for j in range(L):
            for l in range(1, min(ULM_MAX_PIECE, L - j) + 1):
                subs[w[j : j + l]] += f
    vocab = {p: c for p, c in subs.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:ULM_SEED_CAP]
    vocab.update(multi)
    return vocab


def costs_of(counts: dict[str, int]) -> tuple[dict[str, int], int]:
    """Add-one-smoothed quantized costs for a count table; returns
    (costs, smoothed_total)."""
    tot = sum(c + 1 for c in counts.values())
    # the documented "UNK never outbids a real edge" invariant holds
    # only while every real cost <= ln(tot)*Q stays below ULM_UNK_COST
    # — CHECK it rather than assume it (advisor r11: on an extreme
    # corpus the freq-weighted totals could cross e^30 and UNK would
    # silently win over real pieces with no parity break to flag it).
    # The oracle replays these exact counts, so the engine-side guard
    # covers both sides.
    assert tot < math.exp(ULM_UNK_COST / ULM_Q), (
        f"ULM smoothed count total {tot} >= e^{ULM_UNK_COST // ULM_Q}: "
        "ULM_UNK_COST no longer dominates every real piece cost — raise "
        "ULM_UNK_COST or shrink the sketch"
    )
    return {p: q_cost(c, tot) for p, c in counts.items()}, tot


def viterbi(
    word: str, costs: dict[str, int], allow_unk: bool = False
) -> Optional[tuple[tuple[int, int, int], list[str]]]:
    """Min-(cost, n_tokens, n_unk) segmentation of ``word`` under
    piece ``costs``; backtrace ties resolve to the smallest piece
    start (then real-before-UNK, enforced by UNK's strictly larger
    cost). Returns ((cost, n_tokens, n_unk), pieces) — pieces listed
    END-FIRST (backtrace order), exactly like the oracle's segs
    list — or None if the word is uncoverable (only possible with
    allow_unk=False)."""
    L = len(word)
    best: list[Optional[tuple[int, int, int]]] = [(0, 0, 0)] + [None] * L
    for i in range(1, L + 1):
        cand = None
        for j in range(max(0, i - ULM_MAX_PIECE), i):
            bj = best[j]
            if bj is None:
                continue
            c = costs.get(word[j:i])
            if c is None:
                continue
            v = (bj[0] + c, bj[1] + 1, bj[2])
            if cand is None or v < cand:
                cand = v
        if allow_unk and best[i - 1] is not None:
            b = best[i - 1]
            v = (b[0] + ULM_UNK_COST, b[1] + 1, b[2] + 1)
            if cand is None or v < cand:
                cand = v
        best[i] = cand
    if best[L] is None:
        return None
    segs: list[str] = []
    pos = L
    while pos > 0:
        target = best[pos]
        hit_j = hit_piece = None
        for j in range(max(0, pos - ULM_MAX_PIECE), pos):
            bj = best[j]
            if bj is None:
                continue
            piece = word[j:pos]
            c = costs.get(piece)
            if c is not None and (bj[0] + c, bj[1] + 1, bj[2]) == target:
                hit_j, hit_piece = j, piece
                break  # smallest start wins
            if (
                allow_unk
                and j == pos - 1
                and (bj[0] + ULM_UNK_COST, bj[1] + 1, bj[2] + 1) == target
            ):
                # UNK edge exists only at start pos-1; a real edge at
                # the same start would have strictly smaller cost and
                # been taken above, so reaching here is unambiguous
                hit_j, hit_piece = j, ULM_UNK_PIECE
                break
        assert hit_j is not None, "viterbi backtrace: no edge matches"
        segs.append(hit_piece)
        pos = hit_j
    return best[L], segs


def train_ulm(
    word_freqs: Iterable[tuple[str, int]], n_em: int = ULM_N_EM
) -> list[tuple[str, int, int]]:
    """Full deterministic Viterbi-EM train over a (word, freq) sketch.
    Returns [(piece, count, cost)] where count is the final E-step
    usage count and cost the re-smoothed quantized cost."""
    wf = list(word_freqs)
    counts = seed_pieces(wf)
    for _ in range(n_em):
        costs, _tot = costs_of(counts)
        used: Counter = Counter()
        for w, f in wf:
            res = viterbi(w, costs, allow_unk=False)
            assert res is not None, "sketch word uncoverable"
            for p in res[1]:
                used[p] += f
        counts = {p: used.get(p, 0) for p in counts if len(p) == 1}
        counts.update(
            {p: c for p, c in used.items() if len(p) >= 2 and c > 0}
        )
    costs, _tot = costs_of(counts)
    return [(p, counts[p], costs[p]) for p in sorted(counts)]


def encode_stats(
    word: str, costs: dict[str, int]
) -> tuple[int, int]:
    """(n_tokens, n_unk) of the Viterbi segmentation with UNK
    fallback — the dictionary-encode values joined back per word."""
    res = viterbi(word, costs, allow_unk=True)
    assert res is not None  # UNK edges make every word coverable
    (_c, n, u), _segs = res
    return n, u
