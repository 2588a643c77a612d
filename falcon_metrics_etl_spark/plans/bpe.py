"""BPE tokenizer queries — train + dictionary-encode with FULL
cross-engine oracles.

The training oracle replays the exact merge loop in DuckDB as
``N_MERGES`` generated CTE stages (pair counting with overlaps,
deterministic (count DESC, pair ASC) selection, left-to-right
non-overlapping application via a run-parity kept-position set — no
recursion, pure list algebra); the encode oracle unrolls
``ENCODE_STAGES`` lowest-rank-first stages over the DISTINCT-word
dictionary, bounded because a word of <= MAX_WORD_LEN chars holds
<= MAX_WORD_LEN + 1 tokens. Both sides share the exact semantics
pinned in functions/bpe.py.

Spark-first scale shape: the distributed work is the word count and
the per-document aggregation; the merge loop runs inside ONE executor
task over the capped vocabulary (``applyInPandas`` on a literal
group — the plan stays lazy, nothing collects to the driver); words
encode ONCE via the distinct-word dictionary and documents join the
word -> token-count map back (classic dictionary encoding — at 100 TB
the dictionary is vocabulary-sized, not corpus-sized).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions import text as TX
from falcon_metrics_etl_spark.functions.bpe import (
    BYTE_PRETOKEN_RE,
    BYTE_TOKEN_MAX_BYTES,
    ENCODE_STAGES,
    MAX_WORD_LEN,
    N_MERGES,
    VOCAB_CAP,
)
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.sources import load_table

_DUCK_WORDS = f"""
wordsrc AS (
    SELECT doc_id, unnest({TX.DUCK_TOKENS.format(x='text')}) AS word
    FROM documents
),
words AS MATERIALIZED (
    SELECT doc_id, word FROM wordsrc
    WHERE length(word) BETWEEN 1 AND {MAX_WORD_LEN}
      AND NOT regexp_matches(word, '[\\x00-\\x1f\\x7f]')
),
vocab AS MATERIALIZED (
    SELECT word, COUNT(*) AS freq FROM words GROUP BY word
    ORDER BY freq DESC, word LIMIT {VOCAB_CAP}
),
v0 AS MATERIALIZED (
    SELECT word, freq,
           list_append(list_transform(range(1, length(word)+1),
                       i -> word[i]), '</w>') AS toks
    FROM vocab
)"""


def _apply_nested(inner_sql: str, carry: str) -> str:
    """SQL applying one (lhs, rhs) merge to ``toks`` left-to-right,
    non-overlapping: candidate positions C, then the kept subset by
    run parity (within a run of CONSECUTIVE candidates — only possible
    when lhs == rhs — every other one merges, exactly the greedy
    left-to-right rule), then a flatten rebuild. ``inner_sql`` must
    yield {carry}, toks, lhs, rhs; lhs NULL means no-op."""
    return f"""
  SELECT {carry},
    CASE WHEN lhs IS NULL THEN toks ELSE
      flatten(list_transform(range(1, len(toks)+1), j ->
        CASE WHEN list_contains(kept, j) THEN [lhs || rhs]
             WHEN list_contains(kept, j-1) THEN CAST([] AS VARCHAR[])
             ELSE [toks[j]] END)) END AS toks
  FROM (
    SELECT {carry}, toks, lhs, rhs,
      list_transform(
        list_filter(range(1, len(C)+1), k ->
          (k - list_filter(range(1, len(C)+1),
                           q -> C[q] - q = C[k] - k)[1]) % 2 = 0),
        k -> C[k]) AS kept
    FROM (
      SELECT {carry}, toks, lhs, rhs,
        CASE WHEN lhs IS NULL THEN CAST([] AS BIGINT[]) ELSE
          list_filter(range(1, len(toks)),
                      j -> toks[j] = lhs AND toks[j+1] = rhs)
        END AS C
      FROM ({inner_sql})
    )
  )"""


def _train_ctes(words_block: str = _DUCK_WORDS) -> str:
    """p0/v1 .. p{N-1}/v{N} stages + the merges CTE. ``words_block``
    supplies the words/vocab/v0 CTEs — the char-level default or the
    byte-level variant; everything downstream operates on v0.toks and
    is alphabet-agnostic."""
    parts = [words_block]
    for i in range(N_MERGES):
        inner = (
            f"SELECT word, freq, toks, lhs, rhs "
            f"FROM v{i} LEFT JOIN p{i} ON TRUE"
        )
        parts.append(f""",
p{i} AS MATERIALIZED (
  SELECT lhs, rhs, cnt FROM (
    SELECT toks[j] AS lhs, toks[j+1] AS rhs, SUM(freq) AS cnt
    FROM v{i}, unnest(range(1, len(toks))) AS t(j)
    GROUP BY 1, 2
  ) ORDER BY cnt DESC, lhs, rhs LIMIT 1
),
v{i + 1} AS MATERIALIZED ({_apply_nested(inner, "word, freq")}
)""")
    rows = "\n  UNION ALL ".join(
        f"SELECT {i} AS merge_rank, lhs, rhs, cnt FROM p{i}"
        for i in range(N_MERGES)
    )
    parts.append(f""",
merges AS MATERIALIZED (
  {rows}
)""")
    return "WITH " + "".join(parts)


_CHAR_E0 = """
  SELECT word,
         list_append(list_transform(range(1, length(word)+1),
                     i -> word[i]), '</w>') AS toks
  FROM (SELECT DISTINCT word FROM words)"""


def _encode_ctes(e0_body: str = _CHAR_E0, n_stages: int = ENCODE_STAGES) -> str:
    """mk + e0 .. e{E} stages over the distinct-word dictionary.
    ``e0_body`` supplies the initial tokenization (char default /
    byte-level hex pairs); ``n_stages`` bounds the unroll — each
    stage applies at least one merge, so max-tokens-per-word stages
    always reach the fixed point. chr(31) pair packing stays
    unambiguous for BOTH alphabets: control chars are filtered from
    char-level words and hex-pair tokens never contain them."""
    parts = [f""",
mk AS MATERIALIZED (
  SELECT COALESCE(list(lhs || chr(31) || rhs ORDER BY merge_rank),
                  CAST([] AS VARCHAR[])) AS ml
  FROM merges
),
e0 AS MATERIALIZED ({e0_body}
)"""]
    for s in range(n_stages):
        inner = f"""
      SELECT word, toks,
        split_part(ml[br], chr(31), 1) AS lhs,
        split_part(ml[br], chr(31), 2) AS rhs
      FROM (
        SELECT word, toks, ml,
          list_min(list_filter(list_transform(range(1, len(toks)),
              j -> list_position(ml, toks[j] || chr(31) || toks[j+1])),
            p -> p > 0)) AS br
        FROM e{s}, mk
      )"""
        parts.append(f""",
e{s + 1} AS MATERIALIZED ({_apply_nested(inner, "word")}
)""")
    return "".join(parts)


_TRAIN_ORACLE = _train_ctes() + """
SELECT merge_rank, lhs, rhs, lhs || rhs AS merged,
       CAST(cnt AS BIGINT) AS pair_count
FROM merges
"""

_ENCODE_ORACLE = _train_ctes() + _encode_ctes() + f"""
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(e.n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(length(w.word)) AS BIGINT) AS n_chars,
       ROUND(CAST(SUM(length(w.word)) AS DOUBLE) / SUM(e.n_toks), 4)
           AS chars_per_token
FROM words w
JOIN (SELECT word, len(toks) AS n_toks FROM e{ENCODE_STAGES}) e
  USING (word)
GROUP BY w.doc_id
"""


def _words_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("word")
    )
    # control chars are excluded alongside the length cap (advisor r9:
    # the oracle packs merge pairs as lhs||chr(31)||rhs — a word
    # containing U+001F would make that encoding ambiguous and desync
    # the oracle from the engine's real-tuple comparison); ASCII
    # control range matches DuckDB's RE2 class exactly
    return w.filter(
        (F.length("word") >= 1)
        & (F.length("word") <= MAX_WORD_LEN)
        & ~F.col("word").rlike("[\\x00-\\x1f\\x7f]")
    )


def _merges_df(words: DataFrame) -> DataFrame:
    """Capped word-frequency vocab -> the merge table, trained inside
    ONE executor task (applyInPandas over a literal group keeps the
    plan lazy; the vocab is the bounded sketch of the corpus)."""
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(VOCAB_CAP)
    )

    def train(pdf: pd.DataFrame) -> pd.DataFrame:
        from falcon_metrics_etl_spark.functions.bpe import train_bpe

        rows = train_bpe(
            list(zip(pdf["word"], (int(f) for f in pdf["freq"])))
        )
        return pd.DataFrame(
            rows, columns=["merge_rank", "lhs", "rhs", "pair_count"]
        )

    return (
        vocab.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            train,
            "merge_rank int, lhs string, rhs string, pair_count long",
        )
    )


@register(
    "bpe_train_merges",
    doc=f"REAL BPE training (Sennrich 2016) over the corpus: "
    f"distributed word count -> top-{VOCAB_CAP} frequency vocabulary "
    f"(<= {MAX_WORD_LEN}-char words, the standard pre-tokenization "
    f"filter) -> {N_MERGES} merge iterations with overlap-inclusive "
    "pair counts, deterministic (count DESC, pair ASC) selection and "
    "left-to-right non-overlapping application. The merge loop runs "
    "in one executor task over the bounded vocab sketch "
    "(applyInPandas on a literal group — lazy plan, no driver "
    "collect); the oracle replays EVERY iteration as generated CTE "
    "stages (run-parity kept-position list algebra instead of "
    "recursion) and hash-matches the full merge table.",
    tags=("text", "tokenizer", "bpe", "training-data", "iterative"),
    oracle=_TRAIN_ORACLE,
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _merges_df(_words_df(spark, sf_dir))
    return merges.select(
        "merge_rank",
        "lhs",
        "rhs",
        F.concat("lhs", "rhs").alias("merged"),
        F.col("pair_count").cast("long").alias("pair_count"),
    )


@register(
    "bpe_encode_stats",
    doc="BPE dictionary encoding end to end: the SAME training "
    "pipeline feeds a 1-row sorted merge array (broadcast cross "
    "join — the centroid pattern), DISTINCT words encode once via an "
    "Arrow-batched lowest-rank-first merge loop, and documents join "
    "the word -> token-count dictionary back for per-doc token/char "
    "budgets — the token-counting stage a 100 TB pretrain pipeline "
    "runs, with the dictionary vocab-sized rather than corpus-sized. "
    f"Oracle: the training stages plus {ENCODE_STAGES} unrolled "
    "lowest-rank encode stages over the word dictionary (bounded by "
    "MAX_WORD_LEN+1 tokens/word), hash-matched per document.",
    tags=("text", "tokenizer", "bpe", "training-data", "join"),
    oracle=_ENCODE_ORACLE,
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _words_df(spark, sf_dir)
    merges = _merges_df(words)
    enc = _dict_encode(words.select("word").distinct(), merges)
    return (
        words.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            "n_chars",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_tokens"), 4
            ).alias("chars_per_token"),
        )
    )


_PACK_BUDGET = 2048  # tokens per training shard (matches sequence_packing)
_DUCK_DOC_HASH = (
    "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)"
)

_PACK_ORACLE = _train_ctes() + _encode_ctes() + f""",
doc_toks AS MATERIALIZED (
  SELECT w.doc_id, CAST(SUM(e.n_toks) AS BIGINT) AS n_tokens
  FROM words w
  JOIN (SELECT word, len(toks) AS n_toks FROM e{ENCODE_STAGES}) e
    USING (word)
  GROUP BY w.doc_id
),
t AS (
  SELECT d.doc_id, d.lang, dt.n_tokens, {_DUCK_DOC_HASH} AS h
  FROM documents d JOIN doc_toks dt USING (doc_id)
),
c AS (
  SELECT *, SUM(n_tokens) OVER (
      PARTITION BY lang ORDER BY h, CAST(doc_id AS VARCHAR)
      ROWS UNBOUNDED PRECEDING
  ) AS cum
  FROM t
)
SELECT doc_id, lang, n_tokens,
       CAST(FLOOR((cum - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
FROM c
"""


@register(
    "bpe_sequence_packing",
    doc="Pipeline composition: fixed-budget training-shard packing "
    "(sequence_packing's operator) driven by REAL BPE token counts "
    "instead of the chars/4 proxy — train -> dictionary-encode -> "
    "per-doc token budget -> hash-ordered running-sum binning within "
    "each lang, documents never split, overflow bounded by one doc. "
    "The oracle chains the full training + encode stages into the "
    "packing window; at 100 TB the added cost over the proxy version "
    "is one vocab-sized dictionary join.",
    tags=("packing", "tokenizer", "bpe", "window", "training-data"),
    oracle=_PACK_ORACLE,
)
def bpe_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.sampling import pack_sequences

    words = _words_df(spark, sf_dir)
    merges = _merges_df(words)
    enc = _dict_encode(words.select("word").distinct(), merges)
    doc_toks = (
        words.join(enc, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_toks").cast("long").alias("n_tokens"))
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .join(doc_toks, "doc_id")
        .withColumn("k", F.col("doc_id").cast("string"))
    )
    packed = pack_sequences(
        docs, "k", "n_tokens", _PACK_BUDGET, pack_key_cols=["lang"]
    )
    return packed.select("doc_id", "lang", "n_tokens", "pack_id")


# ---------------------------------------------------------------------------
# Byte-level BPE (GPT-2-shaped) — the production pretrain tokenizer
# ---------------------------------------------------------------------------

def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


# byte-level words/vocab/v0 block: GPT-2-style pre-tokens (regex
# shared VERBATIM with the Spark side — functions/bpe.py pins why it
# is lookahead-free and ASCII-classed), each token's alphabet = its
# UTF-8 bytes as uppercase hex pairs, NO end-of-word marker (the
# leading space inside the token marks word boundaries)
_DUCK_BYTE_WORDS = f"""
wordsrc AS (
    SELECT doc_id,
           unnest(regexp_extract_all(text, '{_sql_quote(BYTE_PRETOKEN_RE)}'))
               AS word
    FROM documents
),
words AS MATERIALIZED (
    SELECT doc_id, word FROM wordsrc
    WHERE octet_length(encode(word)) BETWEEN 1 AND {BYTE_TOKEN_MAX_BYTES}
),
vocab AS MATERIALIZED (
    SELECT word, COUNT(*) AS freq FROM words GROUP BY word
    ORDER BY freq DESC, word LIMIT {VOCAB_CAP}
),
v0 AS MATERIALIZED (
    SELECT word, freq,
           list_transform(range(1, octet_length(encode(word)) + 1),
                          i -> substring(upper(hex(encode(word))),
                                         2*i - 1, 2)) AS toks
    FROM vocab
)"""

_BYTE_TRAIN_ORACLE = _train_ctes(_DUCK_BYTE_WORDS) + """
SELECT merge_rank, lhs, rhs, lhs || rhs AS merged,
       CAST(cnt AS BIGINT) AS pair_count
FROM merges
"""


def _byte_merges_df(words: DataFrame) -> DataFrame:
    """Byte-level twin of _merges_df: capped pre-token vocab -> merge
    table over the hex-pair alphabet, trained inside one executor
    task (lazy applyInPandas on a literal group)."""
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(VOCAB_CAP)
    )

    def train(pdf: pd.DataFrame) -> pd.DataFrame:
        from falcon_metrics_etl_spark.functions.bpe import (
            train_bpe_seqs,
            word_to_byte_tokens,
        )

        rows = train_bpe_seqs(
            (word_to_byte_tokens(w), int(f))
            for w, f in zip(pdf["word"], pdf["freq"])
        )
        return pd.DataFrame(
            rows, columns=["merge_rank", "lhs", "rhs", "pair_count"]
        )

    return (
        vocab.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            train,
            "merge_rank int, lhs string, rhs string, pair_count long",
        )
    )


def byte_words_of(docs: DataFrame) -> DataFrame:
    """(doc_id, text) frame -> the GPT-2-shaped (doc_id, word)
    pre-token stream. Frame-based so the incremental ingest tick can
    pre-tokenize a delta batch with the same regex as the corpus."""
    w = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("text", F.lit(BYTE_PRETOKEN_RE), F.lit(0))
        ).alias("word"),
    )
    return w.filter(
        (F.octet_length("word") >= 1)
        & (F.octet_length("word") <= BYTE_TOKEN_MAX_BYTES)
    )


def _byte_words_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return byte_words_of(load_table(spark, sf_dir, "documents"))


@register(
    "bpe_byte_level_merges",
    doc="BYTE-level BPE training, the GPT-2-shaped production "
    "tokenizer (Radford 2019; Sennrich 2016 merge loop): GPT-2-style "
    "regex pre-tokenization (contraction suffixes, space-prefixed "
    "letter/digit/symbol runs — leading space stays inside the "
    f"token), alphabet = UTF-8 bytes as hex pairs, top-{VOCAB_CAP} "
    "pre-token vocabulary, then the same overlap-inclusive count / "
    "(count DESC, pair ASC) select / left-to-right non-overlapping "
    f"apply loop for {N_MERGES} iterations — run in ONE executor "
    "task over the bounded vocab (applyInPandas on a literal group, "
    "lazy plan). The oracle pre-tokenizes with the IDENTICAL regex "
    "(restated lookahead-free so RE2 and Java regex agree), derives "
    "the byte alphabet via hex(encode(word)), and replays every "
    "merge iteration as generated CTE stages.",
    tags=("text", "tokenizer", "bpe", "training-data", "iterative"),
    oracle=_BYTE_TRAIN_ORACLE,
)
def bpe_byte_level_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _byte_merges_df(_byte_words_df(spark, sf_dir))
    return merges.select(
        "merge_rank",
        "lhs",
        "rhs",
        F.concat("lhs", "rhs").alias("merged"),
        F.col("pair_count").cast("long").alias("pair_count"),
    )


_BYTE_E0 = """
  SELECT word,
         list_transform(range(1, octet_length(encode(word)) + 1),
                        i -> substring(upper(hex(encode(word))),
                                       2*i - 1, 2)) AS toks
  FROM (SELECT DISTINCT word FROM words)"""

# a pre-token of <= BYTE_TOKEN_MAX_BYTES bytes holds that many hex
# tokens, so the unroll is bounded the same way ENCODE_STAGES is
_BYTE_ENCODE_STAGES = BYTE_TOKEN_MAX_BYTES

_BYTE_ENCODE_ORACLE = (
    _train_ctes(_DUCK_BYTE_WORDS)
    + _encode_ctes(_BYTE_E0, _BYTE_ENCODE_STAGES)
    + f"""
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_pretokens,
       CAST(SUM(e.n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(octet_length(encode(w.word))) AS BIGINT) AS n_bytes,
       ROUND(CAST(SUM(octet_length(encode(w.word))) AS DOUBLE)
                 / SUM(e.n_toks), 4) AS bytes_per_token
FROM words w
JOIN (SELECT word, len(toks) AS n_toks FROM e{_BYTE_ENCODE_STAGES}) e
  USING (word)
GROUP BY w.doc_id
"""
)


@register(
    "bpe_byte_encode_stats",
    doc="Byte-level BPE dictionary encoding end to end — the token "
    "accounting a GPT-2-style pretrain pipeline runs: the byte-level "
    "training pipeline feeds a 1-row sorted merge array (broadcast "
    "cross join), DISTINCT pre-tokens encode once through the "
    "hex-pair alphabet (Arrow-batched lowest-rank-first loop), and "
    "documents join the pre-token -> token-count dictionary back for "
    "per-doc token/byte budgets. Oracle: byte-level training stages "
    f"plus {_BYTE_ENCODE_STAGES} unrolled encode stages over the "
    "pre-token dictionary, hash-matched per document.",
    tags=("text", "tokenizer", "bpe", "training-data", "join"),
    oracle=_BYTE_ENCODE_ORACLE,
)
def bpe_byte_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return byte_token_budgets(_byte_words_df(spark, sf_dir)).withColumn(
        "bytes_per_token",
        F.round(F.col("n_bytes").cast("double") / F.col("n_tokens"), 4),
    )


def byte_token_budgets(
    words: DataFrame, merges: DataFrame | None = None
) -> DataFrame:
    """(doc_id, word) pre-token stream -> per-doc byte-BPE token
    budgets: train the byte merge table on the stream's vocab sketch
    (or encode with a caller-supplied FROZEN ``merges`` table — the
    incremental-ingest shape, where a tick must tokenize its delta
    with the tokenizer the corpus was trained with, never retrain),
    encode DISTINCT pre-tokens once (Arrow-batched lowest-rank loop),
    join the dictionary back. Shared by the registered
    ``bpe_byte_encode_stats``, bench.py's composed corpus e2e (which
    feeds a survivor-filtered stream), and streaming/corpus_tick.py."""
    if merges is None:
        merges = _byte_merges_df(words)
    enc = _dict_encode(
        words.select("word").distinct(), merges, byte_level=True
    )
    return (
        words.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pretokens"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.sum(F.octet_length("word")).cast("long").alias("n_bytes"),
        )
    )


def _dict_encode(
    dw: DataFrame, merges: DataFrame, byte_level: bool = False
) -> DataFrame:
    """DISTINCT words -> (word, n_toks) encoded with the merge table.

    The merge table crosses the Python boundary as ONE ``sc.broadcast``
    value (r16 optimization, guide §4.1/§4.5): the previous
    ``crossJoin(broadcast(1-row array))`` attached the FULL rank-sorted
    merge array to every dictionary row, so the Arrow transfer carried
    |dict words| x |merges| structs and the rank dict was rebuilt per
    batch. Now the words ship bare, the merge list/ranks build once
    per task, and the plan loses the BroadcastNestedLoopJoin. The
    driver-side collect is control-plane bounded — the merge table is
    N_MERGES / BYTE_N_MERGES rows, a training constant, never
    corpus-sized (the same bounded-read class as the cursor probes)."""
    mb = dw.sparkSession.sparkContext.broadcast(
        [
            (r[0], r[1])
            for r in merges.select("lhs", "rhs", "merge_rank")
            .orderBy("merge_rank", "lhs", "rhs")
            .collect()
        ]
    )
    fn_name = "encode_byte_word" if byte_level else "encode_word"

    def encode(batches):
        import falcon_metrics_etl_spark.functions.bpe as _bpe

        encode_fn = getattr(_bpe, fn_name)
        merge_list = list(mb.value)  # once per task, not per batch
        ranks = {p: i for i, p in enumerate(merge_list)}
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"word": [], "n_toks": []})
                continue
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_toks": [
                        len(encode_fn(w, merge_list, ranks))
                        for w in pdf["word"]
                    ],
                }
            )

    return dw.mapInPandas(encode, "word string, n_toks int")
