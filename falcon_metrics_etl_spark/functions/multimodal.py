"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata —
the lakehouse pattern for multimodal training data: parquet stores the
bytes, Spark never interprets them JVM-side, and decode/feature
extraction runs in Arrow-batched Python (``mapInPandas``), the only
place a codec library can run.

The container for this engine has no image/audio libs, so REAL
decoding is stubbed: codecs other than ``synthetic`` raise
``NotImplementedError`` (clearly marked below) the moment a batch
contains them. The ``synthetic`` codec — a deterministic header
derived from the payload's md5 — keeps every part of the Spark-side
plumbing real and testable: binary columns through Arrow, batch
iteration, output schema, partition-parallelism, and the downstream
JVM-side frame-sampling explode. Swapping in PIL/ffmpeg later touches
only ``_decode_one``.

Scale notes: ``mapInPandas`` is a pure map — no shuffle, linear in
bytes scanned; with payloads in their own parquet column, column
pruning means metadata-only queries never read the bytes at all.
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
for fat rows.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# media_type assignment for the synthetic corpus: stable on doc_id
MEDIA_TYPES = ("image", "audio", "video")

META_SCHEMA = (
    "doc_id long, media_type string, codec string, n_bytes long, "
    "width int, height int, duration_ms int, n_frames int"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media_type, codec, payload binary).

    Payload bytes are the utf-8 text (deterministic, engine-portable);
    media type round-robins on doc_id. This is the bronze shape a real
    multimodal ingest would land: bytes + declared codec."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
        F.lit("synthetic").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def _decode_one(media_type: str, codec: str, payload: bytes) -> dict:
    if codec != "synthetic":
        # STUB: real decoders (PIL / soundfile / pyav) are not in this
        # container. The dispatch, schema, and batching around this
        # point are real; only the codec call is missing.
        raise NotImplementedError(
            f"codec {codec!r}: real media decoding not available here"
        )
    h = hashlib.md5(payload).hexdigest()
    width = int(h[0:4], 16) % 1024 + 1
    height = int(h[4:8], 16) % 1024 + 1
    duration_ms = int(h[8:12], 16) % 60000 + 1
    fps25_frames = duration_ms // 40  # 25 fps
    return {
        "n_bytes": len(payload),
        "width": width if media_type in ("image", "video") else 0,
        "height": height if media_type in ("image", "video") else 0,
        "duration_ms": duration_ms if media_type in ("audio", "video") else 0,
        "n_frames": fps25_frames if media_type == "video" else (
            1 if media_type == "image" else 0
        ),
    }


def decode_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: (doc_id, media_type, codec, payload) ->
    typed metadata rows, schema ``META_SCHEMA``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _decode_one(mt, c, bytes(p))
                for mt, c, p in zip(pdf["media_type"], pdf["codec"], pdf["payload"])
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "codec", pdf["codec"].values)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(run, schema=META_SCHEMA)


def sample_frame_indices(n_frames: Column, every_k: int) -> Column:
    """Every k-th frame index (0-based) — JVM-side sequence, exploded by
    the caller; empty for non-video rows."""
    return F.when(
        n_frames > 0,
        F.sequence(F.lit(0), n_frames - 1, F.lit(every_k)),
    ).otherwise(F.array().cast("array<int>"))


def resize_dims(width: Column, height: Column, box: int) -> Column:
    """Fit-within-box resize arithmetic (aspect preserved, integer
    floor division — exact in any engine): returns struct(target_w,
    target_h). The PIXEL resample would run next to ``_decode_one``
    (and is stubbed with it); the planning arithmetic is JVM-side so a
    resize STAGE can size batches/partitions without touching Python.
    """
    m = F.greatest(width, height)
    # floor division keeps the arithmetic integer-exact across engines
    tw = F.greatest(F.lit(1), F.floor(width * box / m)).cast("int")
    th = F.greatest(F.lit(1), F.floor(height * box / m)).cast("int")
    return F.struct(tw.alias("target_w"), th.alias("target_h"))


FEATURE_DIM = 8
FEATURE_SCHEMA = "doc_id long, dim_idx int, feature double"


def extract_feature_stub(media: DataFrame) -> DataFrame:
    """Feature extraction over opaque payloads, Arrow-batched — the
    binary -> embedding bridge into the vector/ANN layer. The REAL
    model forward pass is stubbed like ``_decode_one``; the synthetic
    features are md5-nibble fractions (k-th 16-bit word / 2^16 —
    exact in double, so the DuckDB oracle replays them bit-for-bit).
    Output is LONG form (doc_id, dim_idx, feature): embedding-as-rows
    shuffles and oracles cleanly at any dimensionality."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, dims, feats = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                h = hashlib.md5(bytes(p)).hexdigest()
                for k in range(FEATURE_DIM):
                    ids.append(doc_id)
                    dims.append(k)
                    feats.append(int(h[4 * k : 4 * k + 4], 16) / 65536.0)
            yield pd.DataFrame(
                {"doc_id": ids, "dim_idx": dims, "feature": feats}
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
