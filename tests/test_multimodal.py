"""Multimodal plumbing tests: Arrow batch shape, schema, codec stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions import multimodal as MM


def _docs(spark):
    return spark.createDataFrame(
        [(0, "alpha"), (1, "bravo charlie"), (2, "delta echo foxtrot")],
        "doc_id long, text string",
    )


def test_payload_is_binary_and_meta_typed(spark):
    media = MM.attach_payload(_docs(spark))
    assert dict(media.dtypes)["payload"] == "binary"
    meta = MM.decode_media_meta(media)
    rows = {r["doc_id"]: r.asDict() for r in meta.collect()}
    assert rows[0]["media_type"] == "image"
    assert rows[0]["n_frames"] == 1 and rows[0]["duration_ms"] == 0
    assert rows[1]["media_type"] == "audio"
    assert rows[1]["width"] == 0 and rows[1]["duration_ms"] > 0
    assert rows[2]["media_type"] == "video"
    assert rows[2]["n_bytes"] == len("delta echo foxtrot")
    # deterministic: re-run produces identical metadata
    assert {r["doc_id"]: r.asDict() for r in meta.collect()} == rows


def test_real_codec_is_stubbed(spark):
    media = MM.attach_payload(_docs(spark)).withColumn(
        "codec", F.lit("jpeg")
    )
    with pytest.raises(Exception) as e:
        MM.decode_media_meta(media).collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, NotImplementedError
    )


def test_frame_sampling_counts(spark):
    media = MM.attach_payload(_docs(spark))
    meta = MM.decode_media_meta(media)
    sampled = meta.filter(F.col("media_type") == "video").select(
        "doc_id",
        "n_frames",
        F.size(MM.sample_frame_indices(F.col("n_frames"), 50)).alias("n_sampled"),
    )
    for r in sampled.collect():
        expect = (r["n_frames"] + 49) // 50
        assert r["n_sampled"] == expect


# --------------------------------------------------------------------------
# Real PNG codec path (encode_png / parse_png_header / codec='png')
# --------------------------------------------------------------------------
def test_png_roundtrip_and_size_formula():
    p = MM.encode_png(13, 7, fill=0x5A)
    hdr = MM.parse_png_header(p)
    assert hdr == {"width": 13, "height": 7, "bit_depth": 8, "color_type": 0}
    assert len(p) == 7 * (13 + 1) + 68  # level-0 IDAT closed form


def test_png_parser_rejects_corrupt_bytes():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        MM.parse_png_header(b"GIF89a not a png at all....................")
    good = bytearray(MM.encode_png(4, 4))
    good[20] ^= 0xFF  # flip a width byte -> IHDR CRC must fail
    with _pytest.raises(ValueError):
        MM.parse_png_header(bytes(good))


def test_png_decode_through_spark_plumbing(spark):
    media = MM.attach_payload_png(_docs(spark))
    meta = MM.decode_media_meta(media).collect()
    assert len(meta) == _docs(spark).count()
    for r in meta:
        assert r["codec"] == "png" and r["media_type"] == "image"
        assert 1 <= r["width"] <= MM.PNG_DIM_MOD
        assert r["n_bytes"] == r["height"] * (r["width"] + 1) + 68
        assert r["n_frames"] == 1 and r["duration_ms"] == 0


# --------------------------------------------------------------------------
# Real WAV codec path (encode_wav / parse_wav_header / codec='wav')
# --------------------------------------------------------------------------
def test_wav_roundtrip_and_size_formula():
    p = MM.encode_wav(1500, fill=0x42)
    hdr = MM.parse_wav_header(p)
    assert hdr == {
        "channels": 1, "sample_rate": 8000, "bits": 8, "duration_ms": 1500,
    }
    assert len(p) == 44 + 8 * 1500


def test_wav_parser_walks_extra_chunks_and_rejects_corrupt():
    import pytest as _pytest
    import struct as _struct

    # splice a LIST chunk between fmt and data — real files do this
    p = MM.encode_wav(10)
    head, data_chunk = p[:36], p[36:]
    listed = head + b"LIST" + _struct.pack("<I", 4) + b"INFO" + data_chunk
    assert MM.parse_wav_header(listed)["duration_ms"] == 10

    with _pytest.raises(ValueError):
        MM.parse_wav_header(b"OggS" + bytes(60))
    with _pytest.raises(ValueError):
        MM.parse_wav_header(p[:36])  # truncated before data chunk


def test_wav_decode_through_spark_plumbing(spark):
    media = MM.attach_payload_wav(_docs(spark))
    meta = MM.decode_media_meta(media).collect()
    for r in meta:
        assert r["codec"] == "wav" and r["media_type"] == "audio"
        assert 1 <= r["duration_ms"] <= MM.WAV_DUR_MOD
        assert r["n_bytes"] == 44 + 8 * r["duration_ms"]
        assert r["width"] == 0 and r["n_frames"] == 0
