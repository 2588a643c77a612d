"""zlib payload inflation — SURVEY.md F14.

The reference inflates base64-encoded zlib payloads returned by its
metrics API (inflateResponse —
/root/reference/src/flomatika_app/process/
extract_flomatika_insights_processor.ts:88-103: base64 decode →
zlib.inflateSync → JSON.parse, with failures logged and swallowed to
an empty object).

Engine shape: base64 ↔ binary is JVM-side (``F.base64`` /
``F.unbase64``); the deflate/inflate itself has no Spark builtin, so
it runs as Arrow-batched scalar pandas UDFs (stdlib ``zlib``, the
same library the PNG codec path uses). Corrupt payloads yield null
(the reference's swallow-and-continue), surfaced to callers as a
quarantine-able column rather than a task failure.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("binary")
def zlib_deflate(data: pd.Series) -> pd.Series:
    """Deflate binary payloads (level 6) — the inverse used to build
    test fixtures and to compact large JSON blobs at rest."""
    return data.map(lambda b: zlib.compress(bytes(b), 6) if b is not None else None)


# cap on inflated size per payload: a hostile/corrupt stream ("zip
# bomb") must not take down an executor — oversized output is treated
# exactly like a corrupt payload (null), never an OOM
MAX_INFLATED_BYTES = 64 * 1024 * 1024


@pandas_udf("binary")
def zlib_inflate(data: pd.Series) -> pd.Series:
    """F14 — inflate zlib payloads; undecodable OR oversized bytes ->
    null (inflateResponse swallows errors, ts:93-101; the size cap is
    an engine-side hardening the single-payload reference never
    needed)."""

    def one(b):
        if b is None:
            return None
        try:
            d = zlib.decompressobj()
            out = d.decompress(bytes(b), MAX_INFLATED_BYTES)
            if d.unconsumed_tail or not d.eof:
                return None  # truncated input or output over the cap
            return out
        except zlib.error:
            return None

    return data.map(one)
