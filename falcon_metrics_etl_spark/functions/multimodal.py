"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata —
the lakehouse pattern for multimodal training data: parquet stores the
bytes, Spark never interprets them JVM-side, and decode/feature
extraction runs in Arrow-batched Python (``mapInPandas``), the only
place a codec library can run.

Three formats decode COMPLETELY in pure stdlib — PNG (every color
type at 1/2/4/8/16-bit, sequential and Adam7-interlaced), WAV
(integer PCM 8/16-bit + IEEE float32, mono/stereo) and Y4M video
(uncompressed planar frames) — with spec-valid encoders backing
closed-form oracles, and JPEG decodes baseline AND progressive,
grayscale and color (functions/jpeg.py). Only formats that genuinely
require codec libraries remain stubbed (mp3, h264, arithmetic-coded
JPEG — clearly marked NotImplementedError); the ``synthetic`` codec
keeps the
plumbing testable for those: binary columns through Arrow, batch
iteration, output schema, partition-parallelism, and the downstream
JVM-side frame-sampling explode. Swapping in PIL/ffmpeg touches only
``_decode_one``.

Scale notes: ``mapInPandas`` is a pure map — no shuffle, linear in
bytes scanned; with payloads in their own parquet column, column
pruning means metadata-only queries never read the bytes at all.
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
for fat rows.
"""

from __future__ import annotations

import hashlib
import struct
import sys
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# media_type assignment for the synthetic corpus: stable on doc_id
MEDIA_TYPES = ("image", "audio", "video")

META_SCHEMA = (
    "doc_id long, media_type string, codec string, n_bytes long, "
    "width int, height int, duration_ms int, n_frames int"
)


def _fan_out(df: DataFrame, heavy: bool = True) -> DataFrame:
    """Rebalance the small pre-payload rows across the cluster before
    the Arrow codec stage: the docs table arrives in FEW input splits
    (one, at bench scale), and payload synthesis/decode are CPU-bound
    per row — without this a 1-split scan serializes the whole codec
    matrix on one core (measured 4x on the char-entropy explode, ~5x
    on progressive JPEG decode). The shuffle moves only (doc_id,
    text); at real scale the same rule applies whenever per-row codec
    cost dominates split granularity.

    Two gates (r9, advisor finding):
    - ``heavy=False`` declares a stage whose per-row cost is trivial
      (the <=16x16 grayscale PNG assembly) — the shuffle costs more
      than the decode saves (measured: 0.35 -> 0.93 s r8 regression);
      the stage keeps its shuffle-free map-only plan.
    - when the input already carries >= defaultParallelism partitions
      (the at-scale case: a 100 TB docs table arrives in thousands of
      splits) the repartition is a no-op at best and a partition-count
      REDUCTION at worst — skip it.
    """
    if not heavy:
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(sc.defaultParallelism)


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


PNG_DIM_MOD = 16  # keeps raw scanlines tiny: <= 16*(16+1) bytes/doc


def attach_payload_png(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media_type, codec, payload) where payload
    is a REAL spec-valid PNG (see encode_png) whose dimensions derive
    deterministically from md5(text) — so an oracle can recompute the
    header fields without parsing bytes. Built in Arrow-batched Python
    (byte assembly can't be a JVM expression); map-only, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                w = int(h[0:4], 16) % PNG_DIM_MOD + 1
                ht = int(h[4:8], 16) % PNG_DIM_MOD + 1
                payloads.append(encode_png(w, ht, fill=int(h[8:10], 16)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "image",
                    "codec": "png",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text"), heavy=False).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


# ---------------------------------------------------------------------------
# PNG — a REAL codec path (pure stdlib, no native deps).
# encode_png writes spec-valid grayscale PNGs (signature, IHDR, a
# level-0 zlib IDAT, CRC-32 per chunk); parse_png_header is a genuine
# header decoder any PNG in the wild satisfies; decode_png_pixels is a
# genuine PIXEL decoder (IDAT inflate + all five scanline filters,
# bpp-aware) for every PNG color type at 1/2/4/8/16-bit depth,
# sequential and Adam7-interlaced (r6 closed the full matrix). The
# remaining stub boundary is mp3-in-wav audio and compressed video
# frames (PIL/ffmpeg swap-in).
# ---------------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, fill: int = 0) -> bytes:
    """Minimal valid 8-bit grayscale PNG: one filter-0 scanline per
    row, IDAT deflated with level 0 (stored block) so the byte size is
    the closed form ``height*(width+1) + 68`` — exactly reproducible
    by a SQL oracle."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([fill & 0xFF]) * width) * height
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 0))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_gradient(width: int, height: int, base: int) -> bytes:
    """Gradient grayscale PNG: pixel(x, y) = base + x + y (callers cap
    ``base`` at 199 and dims at 16 so values never wrap 8 bits — the
    closed-form stats an oracle can replay). Row 0 is stored with
    filter 0 (None); every later row uses filter 2 (Up) whose deltas
    are all 1 — a decoder must genuinely unfilter to recover the
    raster. IDAT is a real deflate stream (level 6), not a stored
    block."""
    row0 = b"\x00" + bytes((base + x) & 0xFF for x in range(width))
    up_rows = (b"\x02" + b"\x01" * width) * (height - 1)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(row0 + up_rows, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _paeth_np(a, b, c):
    """Vectorized Paeth predictor — same tie-breaking order as _paeth
    (a wins ties, then b). int16 inputs (0..255) keep p = a + b - c
    exact."""
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    )


def _filter_scanline(ft: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """FORWARD application of a PNG scanline filter (encoder side) with
    the spec's bpp-aware left/upper-left references — the exact inverse
    of the unfilter loop in decode_png_pixels, so encoders can exercise
    every filter type on multi-byte pixels. Vectorized (r12): forward
    filtering reads only ORIGINAL line/prev bytes (no recurrence), so
    each predictor is one elementwise int16 pass — identical modular
    arithmetic to the scalar loop."""
    cur = np.frombuffer(bytes(line), np.uint8).astype(np.int16)
    up = np.frombuffer(bytes(prev), np.uint8).astype(np.int16)
    n = len(cur)
    a = np.zeros(n, np.int16)
    a[bpp:] = cur[: n - bpp]
    if ft == 0:
        pred = 0
    elif ft == 1:
        pred = a
    elif ft == 2:
        pred = up
    elif ft == 3:
        pred = (a + up) >> 1
    else:
        c = np.zeros(n, np.int16)
        c[bpp:] = up[: n - bpp]
        pred = _paeth_np(a, up, c)
    out = ((cur - pred) & 0xFF).astype(np.uint8)
    return bytes([ft]) + out.tobytes()


PAL_SIZE = 16  # palette entries for encode_png_palette


def encode_png_color(width: int, height: int, base: int) -> bytes:
    """8-bit truecolor PNG (color type 2): pixel(x, y) = (base+x+y,
    base+2x, base+2y) — callers cap base at 199 and dims at 16 so no
    channel wraps 8 bits and every statistic has a closed form. Row y
    is filtered with type y % 5 via the generic forward filter, so a
    decoder must run all five unfilters at bpp=3 to recover the
    raster."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    prev = bytes(3 * width)
    raw = bytearray()
    for y in range(height):
        line = bytearray()
        for x in range(width):
            line += bytes(
                (
                    (base + x + y) & 0xFF,
                    (base + 2 * x) & 0xFF,
                    (base + 2 * y) & 0xFF,
                )
            )
        raw += _filter_scanline(y % 5, bytes(line), prev, 3)
        prev = bytes(line)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(width: int, height: int) -> bytes:
    """8-bit palette PNG (color type 3): PLTE entry i = (i, 2i, 3i),
    index(x, y) = (x + y) % PAL_SIZE. Row y filtered with type
    (y + 3) % 5. Decoding requires unfiltering the index plane AND the
    PLTE lookup — header math cannot reproduce the channel stats."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    plte = b"".join(bytes((i, 2 * i, 3 * i)) for i in range(PAL_SIZE))
    prev = bytes(width)
    raw = bytearray()
    for y in range(height):
        line = bytes((x + y) % PAL_SIZE for x in range(width))
        raw += _filter_scanline((y + 3) % 5, line, prev, 1)
        prev = line
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_rgba(width: int, height: int, base: int) -> bytes:
    """8-bit RGBA PNG (color type 6, bpp=4): pixel(x, y) =
    (base+x+y, base+2x, base+2y, base+3x) — with base capped at 199
    and dims at 16, the alpha channel peaks at 244 so nothing wraps
    8 bits and every statistic keeps a closed form. Row y is filtered
    with type (y+1) % 5, exercising all five filters at bpp=4."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    prev = bytes(4 * width)
    raw = bytearray()
    for y in range(height):
        line = bytearray()
        for x in range(width):
            line += bytes(
                (
                    (base + x + y) & 0xFF,
                    (base + 2 * x) & 0xFF,
                    (base + 2 * y) & 0xFF,
                    (base + 3 * x) & 0xFF,
                )
            )
        raw += _filter_scanline((y + 1) % 5, bytes(line), prev, 4)
        prev = bytes(line)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_gray_alpha(width: int, height: int, base: int) -> bytes:
    """8-bit grayscale+alpha PNG (color type 4, bpp=2): pixel(x, y) =
    (gray=base+x+y, alpha=base+2y). Row y filtered with type
    (y+2) % 5 — the two-byte pixel stride exercises the spec's
    bpp-aware left/upper-left filter references at bpp=2."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 4, 0, 0, 0)
    prev = bytes(2 * width)
    raw = bytearray()
    for y in range(height):
        line = bytearray()
        for x in range(width):
            line += bytes(((base + x + y) & 0xFF, (base + 2 * y) & 0xFF))
        raw += _filter_scanline((y + 2) % 5, bytes(line), prev, 2)
        prev = bytes(line)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


GRAY16_XC, GRAY16_YC = 300, 77  # 16-bit gradient coefficients


def encode_png_gray16(width: int, height: int, base: int) -> bytes:
    """16-bit grayscale PNG (color type 0, depth 16, bpp=2 bytes):
    sample(x, y) = 256*base + 300x + 77y, big-endian — with base
    capped at 199 and dims at 16 the peak is 56,599 < 2^16, so the
    statistics keep closed forms. Row y filtered with type y % 5: the
    two-byte sample stride exercises the bpp-aware filters exactly as
    a real 16-bit encoder would."""
    ihdr = struct.pack(">IIBBBBB", width, height, 16, 0, 0, 0, 0)
    prev = bytes(2 * width)
    raw = bytearray()
    for y in range(height):
        line = bytearray()
        for x in range(width):
            line += struct.pack(
                ">H", 256 * base + GRAY16_XC * x + GRAY16_YC * y
            )
        raw += _filter_scanline(y % 5, bytes(line), prev, 2)
        prev = bytes(line)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _encode_adam7_idat(width, height, bpp, pix):
    """Filtered Adam7 raster: each pass is gathered with the spec's
    (x0,y0,dx,dy) sampling, filtered independently (rows cycle the
    five filter types), and concatenated — the byte stream a real
    interlaced encoder emits. ``pix(x, y)`` returns one pixel's
    ``bpp`` bytes."""
    raw = bytearray()
    row_idx = 0
    for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(width, height):
        if pw == 0 or ph == 0:
            continue
        prev = bytes(pw * bpp)
        for j in range(ph):
            line = bytearray()
            for i in range(pw):
                line += pix(x0 + i * dx, y0 + j * dy)
            raw += _filter_scanline(row_idx % 5, bytes(line), prev, bpp)
            prev = bytes(line)
            row_idx += 1
    return bytes(raw)


def encode_png_gray_interlaced(width: int, height: int, base: int) -> bytes:
    """Adam7-interlaced 8-bit grayscale PNG with the SAME pixel
    formula as encode_png_gradient (pixel = base + x + y): a correct
    deinterlacer must reproduce the sequential gradient raster
    byte-for-byte."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 1)
    raw = _encode_adam7_idat(
        width, height, 1, lambda x, y: bytes([(base + x + y) & 0xFF])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_rgba_interlaced(width: int, height: int, base: int) -> bytes:
    """Adam7-interlaced RGBA (color type 6) with the same channel
    formulas as encode_png_rgba — exercises multi-byte pixel scatter
    across the 7 passes."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 1)

    def pix(x, y):
        return bytes(
            (
                (base + x + y) & 0xFF,
                (base + 2 * x) & 0xFF,
                (base + 2 * y) & 0xFF,
                (base + 3 * x) & 0xFF,
            )
        )

    raw = _encode_adam7_idat(width, height, 4, pix)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # samples per pixel
_PNG_BPP = _PNG_CHANNELS  # at bit depth 8, bytes/pixel == channels

# Adam7 pass geometry: (x_start, y_start, x_step, y_step) per pass --
# the spec's fixed 8x8 sampling pattern
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter_scanlines(raw, pos, rw, h, bpp):
    """Unfilter ``h`` scanlines of ``rw`` payload bytes each starting
    at ``raw[pos]`` -- all five PNG filters with the spec's bpp-aware
    left/upper-left references. Shared by the sequential path (one
    call) and the Adam7 path (one call per non-empty pass, each pass
    being its own independently filtered sub-image). Returns
    (raster, next_pos).

    Vectorized where the recurrence allows (r12): Sub is a per-lane
    prefix sum mod 256 (uint8 accumulate wraps exactly) and Up is one
    wrapping uint8 add against the decoded previous row; Average and
    Paeth genuinely recur on the just-decoded left byte, so they keep
    the scalar loop (Paeth inlined via the standard p-a = b-c
    simplification — same selections)."""
    stride = rw + 1
    if pos + stride * h > len(raw):
        raise ValueError("PNG: raster size does not match dimensions")
    out = bytearray(rw * h)
    prev = bytes(rw)
    prev_np = np.frombuffer(prev, np.uint8)
    for y in range(h):
        ft = raw[pos]
        if ft == 1:  # Sub: lane-wise cumulative sum mod 256
            arr = np.frombuffer(
                raw, np.uint8, rw, pos + 1
            ).reshape(-1, bpp)
            line_np = np.add.accumulate(
                arr, axis=0, dtype=np.uint8
            ).reshape(-1)
            line = line_np.tobytes()
        elif ft == 2:  # Up: wrapping add against the decoded prev row
            line_np = (
                np.frombuffer(raw, np.uint8, rw, pos + 1) + prev_np
            )
            line = line_np.tobytes()
        else:
            ba = bytearray(raw[pos + 1 : pos + stride])
            if ft == 0:
                pass
            elif ft == 3:  # Average
                for x in range(bpp):
                    ba[x] = (ba[x] + (prev[x] >> 1)) & 0xFF
                for x in range(bpp, rw):
                    ba[x] = (
                        ba[x] + ((ba[x - bpp] + prev[x]) >> 1)
                    ) & 0xFF
            elif ft == 4:  # Paeth
                for x in range(bpp):
                    # paeth(0, b, 0) == b for b >= 0
                    ba[x] = (ba[x] + prev[x]) & 0xFF
                for x in range(bpp, rw):
                    a = ba[x - bpp]
                    b = prev[x]
                    c = prev[x - bpp]
                    pa = b - c if b >= c else c - b
                    pb = a - c if a >= c else c - a
                    pc = a + b - 2 * c
                    if pc < 0:
                        pc = -pc
                    if pa <= pb and pa <= pc:
                        pr = a
                    elif pb <= pc:
                        pr = b
                    else:
                        pr = c
                    ba[x] = (ba[x] + pr) & 0xFF
            else:
                raise ValueError(f"PNG: unknown filter type {ft}")
            line = bytes(ba)
            line_np = np.frombuffer(line, np.uint8)
        pos += stride
        out[y * rw : (y + 1) * rw] = line
        prev = line
        prev_np = line_np
    return out, pos


def _adam7_pass_dims(w, h):
    """(x0, y0, dx, dy, pass_w, pass_h) per pass; empty passes have
    pass_w or pass_h == 0 and contribute NO scanlines at all."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = max(0, (w - x0 + dx - 1) // dx)
        ph = max(0, (h - y0 + dy - 1) // dy)
        out.append((x0, y0, dx, dy, pw, ph))
    return out


def encode_png_gray_subbyte(width: int, height: int, depth: int) -> bytes:
    """1/2/4-bit grayscale PNG: pixel(x, y) = (x + y) % 2^depth, rows
    packed MSB-first with per-scanline padding and filtered with type
    y % 5 at the spec's 1-byte sub-byte filter stride."""
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 0, 0, 0, 0)
    mod = 1 << depth
    rwb = (width * depth + 7) // 8
    prev = bytes(rwb)
    raw = bytearray()
    for y in range(height):
        line = _pack_bits([(x + y) % mod for x in range(width)], depth)
        raw += _filter_scanline(y % 5, line, prev, 1)
        prev = line
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette_subbyte(width: int, height: int, depth: int) -> bytes:
    """1/2/4-bit palette PNG: PLTE entry i = (i, 2i, 3i) over 2^depth
    entries, index(x, y) = (x + y) % 2^depth, rows packed and filtered
    like encode_png_gray_subbyte."""
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 3, 0, 0, 0)
    mod = 1 << depth
    plte = b"".join(bytes(((i, 2 * i, 3 * i))) for i in range(mod))
    rwb = (width * depth + 7) // 8
    prev = bytes(rwb)
    raw = bytearray()
    for y in range(height):
        line = _pack_bits([(x + y) % mod for x in range(width)], depth)
        raw += _filter_scanline((y + 1) % 5, line, prev, 1)
        prev = line
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_gray_subbyte_interlaced(
    width: int, height: int, depth: int
) -> bytes:
    """Adam7-interlaced sub-byte grayscale with the same pixel formula
    as encode_png_gray_subbyte — each pass packs ITS OWN scanlines
    (own bit padding), so a byte-level deinterlacer would corrupt it;
    decoding must scatter unpacked samples."""
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 0, 0, 0, 1)
    mod = 1 << depth
    raw = bytearray()
    row_idx = 0
    for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(width, height):
        if pw == 0 or ph == 0:
            continue
        prwb = (pw * depth + 7) // 8
        prev = bytes(prwb)
        for j in range(ph):
            yy = y0 + j * dy
            line = _pack_bits(
                [((x0 + i * dx) + yy) % mod for i in range(pw)], depth
            )
            raw += _filter_scanline(row_idx % 5, line, prev, 1)
            prev = line
            row_idx += 1
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _pack_bits(samples, depth: int) -> bytes:
    """Pack sub-byte samples MSB-first into scanline bytes, padding the
    final byte with zero bits — the spec's packing for depths 1/2/4."""
    out = bytearray()
    acc = nb = 0
    mask = (1 << depth) - 1
    for v in samples:
        acc = (acc << depth) | (v & mask)
        nb += depth
        if nb == 8:
            out.append(acc)
            acc = nb = 0
    if nb:
        out.append(acc << (8 - nb))
    return bytes(out)


def _unpack_bits(row: bytes, w: int, depth: int) -> bytearray:
    """Expand one packed scanline to ``w`` per-sample bytes (values
    0..2^depth-1), MSB-first within each byte."""
    out = bytearray(w)
    mask = (1 << depth) - 1
    for i in range(w):
        bit = i * depth
        out[i] = (row[bit >> 3] >> (8 - depth - (bit & 7))) & mask
    return out


def _unpack_rows(packed, rwb: int, w: int, h: int, depth: int):
    """Vectorized sub-byte unpack (r12): ``h`` packed scanlines of
    ``rwb`` bytes -> (h, w) uint8 samples, MSB-first within each byte
    with per-scanline bit padding dropped — same values as
    _unpack_bits row by row."""
    arr = np.frombuffer(bytes(packed), np.uint8).reshape(h, rwb)
    per = 8 // depth
    shifts = np.arange(per - 1, -1, -1, dtype=np.uint8) * depth
    vals = (arr[:, :, None] >> shifts) & ((1 << depth) - 1)
    return vals.reshape(h, rwb * per)[:, :w]


def decode_png_pixels(payload: bytes):
    """REAL pixel decode, pure stdlib: chunk walk collecting IDAT (and
    PLTE), zlib inflate, then per-scanline unfiltering implementing ALL
    five PNG filter types (None/Sub/Up/Average/Paeth) with the
    bpp-aware left/upper-left references the spec requires. Supported:
    every color type -- grayscale (0), truecolor RGB (2), palette (3 --
    indices unfiltered at bpp=1, then PLTE-expanded to RGB),
    gray+alpha (4) and RGBA (6) -- at bit depth 8 AND 16 (16-bit
    samples unfilter at bpp = 2*channels byte stride per the spec,
    then unpack big-endian), both sequential and Adam7-interlaced
    (each of the 7 passes is its own independently filtered sub-image;
    empty passes contribute no scanlines) AND sub-byte depths (1/2/4-
    bit gray or palette: scanlines filter on whole BYTES with a 1-byte
    left reference per the spec, then samples unpack MSB-first with
    per-scanline bit padding). Nothing PNG remains stubbed; truncated
    or malformed rasters raise ValueError (quarantine-able), and
    spec-invalid depth/color-type combinations (e.g. 16-bit palette,
    2-bit RGB) are ValueError too, not NotImplementedError.

    Returns (width, height, channels, raster) -- raster is
    channel-interleaved, ``width * height * channels`` samples: a
    bytearray (sub-byte gray decodes to RAW 0..2^depth-1 values, not
    rescaled) for depths <= 8, an array('H') of 0..65535 values for
    16-bit."""
    hdr = parse_png_header(payload)
    depth = hdr["bit_depth"]
    ct = hdr["color_type"]
    if (
        depth not in (1, 2, 4, 8, 16)
        or ct not in _PNG_CHANNELS
        or hdr["interlace"] not in (0, 1)
    ):
        raise ValueError("PNG: invalid bit depth / color type / interlace")
    # spec-valid combinations: gray 1/2/4/8/16, RGB(A)/gray+alpha 8/16,
    # palette 1/2/4/8
    if ct in (2, 4, 6) and depth < 8:
        raise ValueError("PNG: sub-byte depth is gray/palette only")
    if ct == 3 and depth == 16:
        raise ValueError("PNG: palette images cannot be 16-bit")
    w, h = hdr["width"], hdr["height"]
    channels = _PNG_CHANNELS[ct]
    # filter byte stride per pixel; sub-byte rows filter on whole
    # bytes with a 1-byte left reference (spec: bpp rounds up to 1)
    bpp = max(1, channels * (depth // 8))
    pos, idat, plte = 8, [], None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat.append(payload[pos + 8 : pos + 8 + ln])
        elif tag == b"PLTE":
            plte = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(b"".join(idat))
    if depth < 8:
        # packed rows: unfilter at the padded byte width, then unpack
        # each scanline to one sample per byte (pixel-granular scatter
        # for Adam7 happens on the UNPACKED samples — pass rows have
        # their own bit padding, so byte-level scatter would be wrong)
        if hdr["interlace"] == 0:
            rwb = (w * depth + 7) // 8
            packed, end = _unfilter_scanlines(raw, 0, rwb, h, 1)
            if end != len(raw):
                raise ValueError("PNG: raster size does not match dimensions")
            out = bytearray(_unpack_rows(packed, rwb, w, h, depth).tobytes())
        else:
            out = bytearray(w * h)
            out_np = np.frombuffer(out, np.uint8).reshape(h, w)
            at = 0
            for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(w, h):
                if pw == 0 or ph == 0:
                    continue
                prwb = (pw * depth + 7) // 8
                sub, at = _unfilter_scanlines(raw, at, prwb, ph, 1)
                # strided scatter: rows y0 + j*dy, cols x0 + i*dx —
                # the [start::step] view has exactly (ph, pw) shape
                # by _adam7_pass_dims' definition
                out_np[y0::dy, x0::dx] = _unpack_rows(
                    sub, prwb, pw, ph, depth
                )
            if at != len(raw):
                raise ValueError("PNG: raster size does not match dimensions")
    else:
        rw = w * bpp  # filtered scanline payload width in BYTES
        if hdr["interlace"] == 0:
            out, end = _unfilter_scanlines(raw, 0, rw, h, bpp)
            if end != len(raw):
                raise ValueError("PNG: raster size does not match dimensions")
        else:
            out = bytearray(rw * h)
            out_np = np.frombuffer(out, np.uint8).reshape(h, w, bpp)
            at = 0
            for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(w, h):
                if pw == 0 or ph == 0:
                    continue
                sub, at = _unfilter_scanlines(raw, at, pw * bpp, ph, bpp)
                out_np[y0::dy, x0::dx] = np.frombuffer(
                    bytes(sub), np.uint8
                ).reshape(ph, pw, bpp)
            if at != len(raw):
                raise ValueError("PNG: raster size does not match dimensions")
    if hdr["color_type"] == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("PNG: palette image without a valid PLTE chunk")
        n_pal = len(plte) // 3
        idx = np.frombuffer(bytes(out), np.uint8)
        if idx.size and int(idx.max()) >= n_pal:
            raise ValueError("PNG: palette index out of range")
        pal = np.frombuffer(plte, np.uint8).reshape(n_pal, 3)
        return w, h, 3, bytearray(pal[idx].tobytes())
    if depth == 16:
        import array

        samples = array.array("H")
        samples.frombytes(bytes(out))
        if sys.byteorder == "little":
            samples.byteswap()  # PNG samples are big-endian
        return w, h, channels, samples
    return w, h, channels, out


def resample_nearest(
    pixels: bytearray, w: int, h: int, tw: int, th: int, channels: int = 1
) -> bytearray:
    """Nearest-neighbour resample with the floor mapping
    src = (dst * src_size) // dst_size — integer-exact, so a SQL
    oracle replays the sampled indices with the same arithmetic.
    Channel-interleaved rasters resample whole pixels (stride =
    ``channels`` bytes). Vectorized (r12): one fancy-index gather on
    the same floor-mapped indices."""
    a = np.asarray(pixels)
    if a.ndim == 1:
        a = a.reshape(h, w, channels)
    sy = np.arange(th) * h // th
    sx = np.arange(tw) * w // tw
    res = a[np.ix_(sy, sx)]
    if res.dtype == np.uint8:
        return bytearray(res.tobytes())
    # 16-bit rasters arrive as array('H') -> uint16; preserve the
    # flat-sequence contract for non-byte samples
    import array

    flat = array.array("H")
    flat.frombytes(res.astype(np.uint16, copy=False).tobytes())
    return flat


def parse_png_header(payload: bytes) -> dict:
    """Real PNG header parse: signature + IHDR width/height/bit-depth/
    color-type, with structural validation. Raises ValueError on
    non-PNG bytes (a quarantine-able decode error, not a crash)."""
    if len(payload) < 33 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    (ihdr_len,) = struct.unpack(">I", payload[8:12])
    if payload[12:16] != b"IHDR" or ihdr_len != 13:
        raise ValueError("not a PNG: first chunk is not IHDR")
    width, height = struct.unpack(">II", payload[16:24])
    bit_depth, color_type = payload[24], payload[25]
    (crc,) = struct.unpack(">I", payload[29:33])
    if crc != (zlib.crc32(payload[12:29]) & 0xFFFFFFFF):
        raise ValueError("PNG IHDR CRC mismatch")
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "interlace": payload[28],
    }


# ---------------------------------------------------------------------------
# WAV — second real codec (RIFF container, pure stdlib).
# ---------------------------------------------------------------------------
WAV_SAMPLE_RATE = 8000  # 8 kHz mono 8-bit: byte_rate == sample rate
WAV_DUR_MOD = 2000  # synthetic clips <= 2 s keeps payloads <= 16 KB


def attach_payload_wav(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media_type, codec, payload) where payload
    is a REAL PCM WAV whose duration derives from md5(text) — the
    audio twin of attach_payload_png. Map-only Arrow-batched build."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                dur = int(h[8:12], 16) % WAV_DUR_MOD + 1
                payloads.append(encode_wav(dur, fill=int(h[10:12], 16)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "audio",
                    "codec": "wav",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


def encode_wav(duration_ms: int, fill: int = 0) -> bytes:
    """Minimal valid PCM WAV: RIFF/WAVE header + 16-byte fmt chunk
    (mono, 8-bit, 8 kHz) + data chunk of silence. Byte size is the
    closed form ``44 + 8 * duration_ms`` — oracle-reproducible."""
    n_samples = WAV_SAMPLE_RATE * duration_ms // 1000
    data = bytes([fill & 0xFF]) * n_samples
    fmt = struct.pack(
        "<HHIIHH", 1, 1, WAV_SAMPLE_RATE, WAV_SAMPLE_RATE, 1, 8
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n_samples)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", n_samples)
        + data
    )


def parse_wav_header(payload: bytes) -> dict:
    """Real RIFF/WAVE header parse: container tags, fmt chunk
    (channels, sample rate, byte rate, bit depth), then a chunk walk to
    the data chunk — handles extra chunks (LIST, fact) the way real
    files carry them. Raises ValueError on non-WAV bytes."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    if payload[12:16] != b"fmt ":
        raise ValueError("not a WAV: fmt chunk missing")
    (fmt_len,) = struct.unpack("<I", payload[16:20])
    _, channels, sample_rate, byte_rate, _, bits = struct.unpack(
        "<HHIIHH", payload[20:36]
    )
    if byte_rate == 0:
        raise ValueError("WAV: zero byte rate")
    pos = 20 + fmt_len
    while pos + 8 <= len(payload):  # chunk walk to 'data'
        tag, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        if tag == b"data":
            return {
                "channels": channels,
                "sample_rate": sample_rate,
                "bits": bits,
                "duration_ms": size * 1000 // byte_rate,
            }
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    raise ValueError("WAV: no data chunk")


def encode_wav_square(duration_ms: int, base: int) -> bytes:
    """PCM WAV whose samples alternate base, base+1 — reading the
    header alone cannot produce these statistics; the data chunk must
    actually be decoded. Same container as encode_wav."""
    n_samples = WAV_SAMPLE_RATE * duration_ms // 1000
    data = bytes((base + (i & 1)) & 0xFF for i in range(n_samples))
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_SAMPLE_RATE, WAV_SAMPLE_RATE, 1, 8)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n_samples)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", n_samples)
        + data
    )


# IMA (DVI) ADPCM tables — public spec (IMA Digital Audio Focus and
# Technical Working Groups, "Recommended Practices for Enhancing
# Digital Audio Compatibility", rev 3.00, 1992)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)


def _ima_step(predictor: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM decode step — shared verbatim by the decoder AND
    the encoder's state tracking, so encoder-side prediction can never
    drift from what a decoder reconstructs."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nibble]))
    return predictor, index


def _ima_decode_block(block: bytes) -> list[int]:
    """Decode one mono IMA-ADPCM block: 4-byte header (int16 predictor
    = the first output sample, step index, reserved), then two nibbles
    per byte, LOW nibble first."""
    if len(block) < 4:
        raise ValueError("IMA-ADPCM: truncated block header")
    predictor = struct.unpack("<h", block[0:2])[0]
    index = block[2]
    if index > 88:
        raise ValueError(f"IMA-ADPCM: step index {index} out of range")
    out = [predictor]
    for byte in block[4:]:
        for nibble in (byte & 0x0F, byte >> 4):
            predictor, index = _ima_step(predictor, index, nibble)
            out.append(predictor)
    return out


def _ima_decode_block_stereo(block: bytes) -> list[int]:
    """Decode one stereo IMA-ADPCM block: two 4-byte channel headers
    (left then right), then 8-byte groups — 4 bytes (8 nibbles) of
    LEFT samples followed by 4 bytes of RIGHT — emitted channel-
    interleaved (L R L R ...) like stored PCM stereo."""
    if len(block) < 8:
        raise ValueError("IMA-ADPCM: truncated stereo block header")
    state = []
    for c in range(2):
        pred = struct.unpack("<h", block[4 * c : 4 * c + 2])[0]
        index = block[4 * c + 2]
        if index > 88:
            raise ValueError(f"IMA-ADPCM: step index {index} out of range")
        state.append((pred, index))
    out = [state[0][0], state[1][0]]
    body = block[8:]
    if len(body) % 8:
        raise ValueError("IMA-ADPCM: stereo data not 8-byte aligned")
    for g in range(0, len(body), 8):
        per_chan: list[list[int]] = []
        for c in range(2):
            pred, index = state[c]
            chan = []
            for byte in body[g + 4 * c : g + 4 * c + 4]:
                for nibble in (byte & 0x0F, byte >> 4):
                    pred, index = _ima_step(pred, index, nibble)
                    chan.append(pred)
            state[c] = (pred, index)
            per_chan.append(chan)
        for left, right in zip(per_chan[0], per_chan[1]):
            out.extend((left, right))
    return out


ADPCM_BLOCK_ALIGN = 256  # mono: (256-4)*2 + 1 = 505 samples per block


def _ima_encode_nibble(s: int, predictor: int, index: int) -> int:
    """Quantize one target sample against the current (predictor,
    index) state — the canonical threshold cascade."""
    step = _IMA_STEP_TABLE[index]
    diff = s - predictor
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    return nibble


# MS-ADPCM (WAV format 2) — public Microsoft WAVE spec constants
_MS_COEFFS = ((256, 0), (512, -256), (0, 0), (192, 64),
              (240, 0), (460, -208), (392, -232))
_MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)


def _ms_trunc_div256(n: int) -> int:
    """C-style ``/256`` (truncation toward zero). The MS-ADPCM spec and
    real decoders (ffmpeg, libsndfile) truncate the coefficient
    prediction toward zero; ``>> 8`` floors, which is off by one for
    negative ``s1*c1 + s2*c2`` under the c2 != 0 predictors and the
    error feeds forward through the s1/s2 state."""
    return n // 256 if n >= 0 else -((-n) // 256)


def _ms_adpcm_step(
    nibble: int, s1: int, s2: int, delta: int, c1: int, c2: int
) -> tuple[int, int]:
    """One MS-ADPCM decode step: returns (sample, next_delta).
    ``nibble`` is the raw unsigned 4-bit code; its signed value is
    two's complement."""
    signed = nibble - 16 if nibble >= 8 else nibble
    pred = _ms_trunc_div256(s1 * c1 + s2 * c2) + signed * delta
    pred = max(-32768, min(32767, pred))
    delta = max(16, (_MS_ADAPT[nibble] * delta) >> 8)
    return pred, delta


def _ms_decode_block(block: bytes, channels: int) -> list[int]:
    """Decode one MS-ADPCM block (mono or stereo): per-channel 7-byte
    headers (predictor index, int16 delta, int16 sample1, int16
    sample2), then one nibble per channel per frame — HIGH nibble
    first; stereo alternates channels within each byte."""
    hdr = 7 * channels
    if len(block) < hdr:
        raise ValueError("MS-ADPCM: truncated block header")
    coef = []
    delta = []
    s1 = []
    s2 = []
    for c in range(channels):
        pidx = block[c]
        if pidx >= len(_MS_COEFFS):
            raise ValueError(f"MS-ADPCM: predictor index {pidx} out of range")
        coef.append(_MS_COEFFS[pidx])
        (d,) = struct.unpack("<h", block[channels + 2 * c:
                                         channels + 2 * c + 2])
        delta.append(d)
        (a,) = struct.unpack("<h", block[3 * channels + 2 * c:
                                         3 * channels + 2 * c + 2])
        s1.append(a)
        (b,) = struct.unpack("<h", block[5 * channels + 2 * c:
                                         5 * channels + 2 * c + 2])
        s2.append(b)
    # output starts with the two header samples per channel,
    # OLDER (sample2) first, channel-interleaved
    out = []
    for c in range(channels):
        out.append(s2[c])
    for c in range(channels):
        out.append(s1[c])
    chan = 0
    for byte in block[hdr:]:
        for nibble in (byte >> 4, byte & 0x0F):
            c = chan % channels
            sample, delta[c] = _ms_adpcm_step(
                nibble, s1[c], s2[c], delta[c], *coef[c]
            )
            s2[c], s1[c] = s1[c], sample
            out.append(sample)
            chan += 1
    return out


def encode_wav_ms_adpcm(
    samples: list[int],
    sample_rate: int = WAV_SAMPLE_RATE,
    block_align: int = ADPCM_BLOCK_ALIGN,
    channels: int = 1,
    predictor: int = 0,
    initial_delta: int = 16,
) -> bytes:
    """MS-ADPCM (WAV format 2) encoder, mono or stereo interleaved:
    fixed predictor choice (callers pick; real encoders try all 7 and
    keep the best), nibbles quantized and state-tracked through the
    SAME ``_ms_adpcm_step`` the decoder uses. The fact chunk records
    the true per-channel sample count."""
    if channels not in (1, 2):
        raise ValueError("MS-ADPCM encode: mono/stereo only")
    if channels == 2 and len(samples) % 2:
        raise ValueError("MS-ADPCM encode: odd stereo sample count")
    frames = len(samples) // channels
    if frames < 2:
        raise ValueError("MS-ADPCM encode: need at least 2 frames")
    chans = [samples[c::channels] for c in range(channels)]
    fpb = (block_align - 7 * channels) * 2 // channels + 2
    c1, c2 = _MS_COEFFS[predictor]
    blocks = []
    for start in range(0, frames, fpb):
        chunk_len = min(fpb, frames - start)
        if chunk_len < 2:
            # spec blocks carry two header samples; a 1-frame tail
            # repeats the final sample (fact trims it back)
            chunk_len = 2
        state = []
        for c in range(channels):
            ch = chans[c][start : start + chunk_len]
            if len(ch) < 2:
                ch = ch + ch[-1:]
            state.append({
                "s2": ch[0], "s1": ch[1], "delta": initial_delta,
                "rest": ch[2:],
            })
        header = bytearray()
        for c in range(channels):
            header.append(predictor)
        for c in range(channels):
            header += struct.pack("<h", state[c]["delta"])
        for c in range(channels):
            header += struct.pack("<h", state[c]["s1"])
        for c in range(channels):
            header += struct.pack("<h", state[c]["s2"])
        n_nibbles = (block_align - 7 * channels) * 2
        nibbles = []
        for i in range(n_nibbles):
            c = i % channels
            st = state[c]
            pos = i // channels
            pred = _ms_trunc_div256(st["s1"] * c1 + st["s2"] * c2)
            target = st["rest"][pos] if pos < len(st["rest"]) else pred
            signed = (target - pred) // st["delta"] if st["delta"] else 0
            signed = max(-8, min(7, signed))
            nibble = signed & 0x0F
            sample, st["delta"] = _ms_adpcm_step(
                nibble, st["s1"], st["s2"], st["delta"], c1, c2
            )
            st["s2"], st["s1"] = st["s1"], sample
            nibbles.append(nibble)
        body = bytes(
            (nibbles[i] << 4) | nibbles[i + 1]
            for i in range(0, len(nibbles), 2)
        )
        blocks.append(bytes(header) + body)
    data = b"".join(blocks)
    byte_rate = (sample_rate * block_align + fpb - 1) // fpb
    # fmt extension: wSamplesPerBlock + wNumCoef + the 7 coeff pairs
    ext = struct.pack("<HH", fpb, len(_MS_COEFFS))
    for a, b in _MS_COEFFS:
        ext += struct.pack("<hh", a, b)
    fmt = struct.pack(
        "<HHIIHHH", 2, channels, sample_rate, byte_rate, block_align,
        4, len(ext),
    ) + ext
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, frames)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# G.711 companded telephony audio (public ITU-T spec; the constants
# and branch structure are the classic CCITT reference decode)
_G711_SIGN, _G711_QUANT, _G711_SEG, _G711_SHIFT, _G711_BIAS = (
    0x80, 0x0F, 0x70, 4, 0x84,
)


def g711_ulaw_to_linear(b: int) -> int:
    """One mu-law byte -> 16-bit linear sample (max magnitude 32124)."""
    u = ~b & 0xFF
    t = ((u & _G711_QUANT) << 3) + _G711_BIAS
    t <<= (u & _G711_SEG) >> _G711_SHIFT
    return (_G711_BIAS - t) if (u & _G711_SIGN) else (t - _G711_BIAS)


def g711_alaw_to_linear(b: int) -> int:
    """One A-law byte -> 16-bit linear sample (max magnitude 32256)."""
    a = b ^ 0x55
    t = (a & _G711_QUANT) << 4
    seg = (a & _G711_SEG) >> _G711_SHIFT
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t += 0x108
        t <<= seg - 1
    return t if (a & _G711_SIGN) else -t


def encode_wav_g711(
    data: bytes,
    law: str,
    sample_rate: int = WAV_SAMPLE_RATE,
    channels: int = 1,
) -> bytes:
    """G.711 WAV container: format 6 (A-law) / 7 (mu-law), 8 bits per
    companded sample, raw bytes as the data chunk."""
    fmt_tag = {"alaw": 6, "ulaw": 7}[law]
    fmt = struct.pack(
        "<HHIIHHH", fmt_tag, channels, sample_rate,
        sample_rate * channels, channels, 8, 0,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, len(data) // channels)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def encode_wav_ima_adpcm(
    samples: list[int],
    sample_rate: int = WAV_SAMPLE_RATE,
    block_align: int = ADPCM_BLOCK_ALIGN,
    channels: int = 1,
) -> bytes:
    """IMA-ADPCM (WAV format 17) encoder, mono or stereo (stereo
    input channel-interleaved L R L R): per block, each channel's
    first sample lands verbatim in its 4-byte header, the rest
    quantize to 4-bit nibbles tracked through the SAME ``_ima_step``
    state update the decoder uses; stereo packs 8-nibble (4-byte)
    channel words, left first. The fact chunk records the true
    per-channel sample count so decoders trim end-of-stream
    padding."""
    if not samples:
        raise ValueError("IMA-ADPCM encode: empty sample stream")
    if channels not in (1, 2):
        raise ValueError("IMA-ADPCM encode: mono/stereo only")
    if channels == 2 and len(samples) % 2:
        raise ValueError("IMA-ADPCM encode: odd stereo sample count")
    # per-channel samples per block
    spb = (block_align // channels - 4) * 2 + 1
    frames_per_block = spb
    frames = len(samples) // channels
    chans = [samples[c::channels] for c in range(channels)]
    index = [0] * channels
    blocks = []
    for start in range(0, frames, frames_per_block):
        headers = []
        nibs: list[list[int]] = []
        for c in range(channels):
            chunk = chans[c][start : start + frames_per_block]
            predictor = max(-32768, min(32767, chunk[0]))
            headers.append(struct.pack("<hBB", predictor, index[c], 0))
            cn = []
            for s in chunk[1:]:
                nibble = _ima_encode_nibble(s, predictor, index[c])
                predictor, index[c] = _ima_step(predictor, index[c], nibble)
                cn.append(nibble)
            # pad the final block (decoder trims via fact)
            cn.extend(0 for _ in range((spb - 1) - len(cn)))
            nibs.append(cn)
        body = bytearray()
        if channels == 1:
            flat = nibs[0]
            body += bytes(
                flat[i] | (flat[i + 1] << 4)
                for i in range(0, len(flat), 2)
            )
        else:
            # 8-byte groups: 4 bytes (8 nibbles) left, 4 bytes right
            for g in range(0, len(nibs[0]), 8):
                for c in range(2):
                    grp = nibs[c][g : g + 8]
                    body += bytes(
                        grp[i] | (grp[i + 1] << 4)
                        for i in range(0, 8, 2)
                    )
        blocks.append(b"".join(headers) + bytes(body))
    data = b"".join(blocks)
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 17, channels, sample_rate, byte_rate, block_align,
        4, 2, spb,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, frames)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _wav_walk(payload: bytes):
    """Validate the RIFF/fmt headers and walk the chunks to the data
    chunk. Returns (audio_format, channels, sample_rate, block_align,
    bits, fact_samples, body) — shared by the list-contract
    ``decode_wav_samples`` and the vectorized
    ``decode_wav_samples_np`` (r12)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    if payload[12:16] != b"fmt ":
        raise ValueError("not a WAV: fmt chunk missing")
    (fmt_len,) = struct.unpack("<I", payload[16:20])
    audio_format, channels, sample_rate, _, block_align, bits = struct.unpack(
        "<HHIIHH", payload[20:36]
    )
    if audio_format not in (1, 2, 3, 6, 7, 17):
        # STUB BOUNDARY: perceptual codecs (mp3-in-wav) need a codec lib
        raise NotImplementedError(
            f"WAV format {audio_format}: integer PCM (1), MS-ADPCM (2), "
            "IEEE float (3), G.711 A-law (6) / mu-law (7) and "
            "IMA-ADPCM (17) only"
        )
    if channels not in (1, 2):
        raise NotImplementedError("mono/stereo decode only")
    if audio_format == 1 and bits not in (8, 16):
        raise NotImplementedError("8/16-bit integer PCM decode only")
    if audio_format == 3 and bits != 32:
        raise NotImplementedError("IEEE float WAV must be 32-bit")
    if audio_format in (6, 7) and bits != 8:
        raise ValueError("G.711 WAV must be 8-bit companded")
    if audio_format == 17:
        if bits != 4:
            raise ValueError("IMA-ADPCM WAV must be 4-bit")
        if block_align < 5 * channels:
            raise ValueError("IMA-ADPCM: block align too small")
    if audio_format == 2:
        if bits != 4:
            raise ValueError("MS-ADPCM WAV must be 4-bit")
        if block_align < 8 * channels:
            raise ValueError("MS-ADPCM: block align too small")
    fact_samples = None
    pos = 20 + fmt_len
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if tag == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack(
                "<I", payload[pos + 8 : pos + 12]
            )
        if tag == b"data":
            return (
                audio_format, channels, sample_rate, block_align,
                bits, fact_samples, payload[pos + 8 : pos + 8 + size],
            )
        pos += 8 + size + (size & 1)
    raise ValueError("WAV: no data chunk")


# below this many full mono blocks the numpy batch path costs more in
# per-op overhead than it saves (fixture clips run 1-4 blocks; the
# batch path exists for LONG recordings — an hour of 8 kHz mono IMA is
# ~57k blocks, where per-nibble Python is the decode floor)
IMA_BATCH_MIN_BLOCKS = 8

# blocks per numpy batch: caps the peak allocation of the nibble and
# output matrices at a few MB regardless of stream length (an hour of
# audio is tens of thousands of blocks — materializing the whole
# stream's matrices at once cost hundreds of MB per UDF worker row),
# while keeping the vector width far past where the per-step overhead
# amortizes. Blocks are independent, so chunking is exact.
ADPCM_BATCH_CHUNK_BLOCKS = 8192


def _in_block_chunks(body: bytes, block_align: int, decode) -> list[int]:
    """Run a cross-block numpy batch decoder over bounded chunks of
    full blocks, concatenating the per-chunk sample lists."""
    n_blocks = len(body) // block_align
    if n_blocks <= ADPCM_BATCH_CHUNK_BLOCKS:
        return decode(body)
    out: list[int] = []
    step = ADPCM_BATCH_CHUNK_BLOCKS * block_align
    for off in range(0, n_blocks * block_align, step):
        out.extend(decode(body[off : off + step]))
    return out


def _ima_decode_blocks_np(body: bytes, block_align: int) -> list[int]:
    """Batch-decode FULL-SIZE mono IMA-ADPCM blocks ACROSS blocks
    (r13): every block carries its own (predictor, step index) header
    and no state crosses block boundaries — the same independence the
    JPEG restart segments exploit — so the per-nibble recursion runs
    once over a (n_blocks,)-wide numpy vector instead of per block.
    Within a block the recursion is genuinely serial (each predictor
    feeds the next), so the loop length stays 2*(block_align-4) steps;
    the width is where the win is. Bit-identical to _ima_decode_block
    (fuzz-pinned): same shifts, clamps and table updates in int64.
    Returns the concatenated per-block sample lists."""
    n_blocks = len(body) // block_align
    arr = np.frombuffer(body, np.uint8)[: n_blocks * block_align]
    blocks = arr.reshape(n_blocks, block_align)
    pred = (
        blocks[:, 0].astype(np.int64)
        | (blocks[:, 1].astype(np.int64) << 8)
    )
    pred = np.where(pred >= 32768, pred - 65536, pred)
    index = blocks[:, 2].astype(np.int64)
    if (index > 88).any():
        raise ValueError(
            f"IMA-ADPCM: step index {int(index.max())} out of range"
        )
    data = blocks[:, 4:]
    n_steps = data.shape[1] * 2
    # nibble matrix (n_blocks, n_steps): LOW nibble first per byte
    nibs = np.empty((n_blocks, n_steps), dtype=np.int64)
    nibs[:, 0::2] = data & 0x0F
    nibs[:, 1::2] = data >> 4
    step_tab = np.asarray(_IMA_STEP_TABLE, dtype=np.int64)
    idx_tab = np.asarray(_IMA_INDEX_TABLE, dtype=np.int64)
    out = np.empty((n_blocks, n_steps + 1), dtype=np.int64)
    out[:, 0] = pred
    for i in range(n_steps):
        nib = nibs[:, i]
        step = step_tab[index]
        diff = (
            (step >> 3)
            + np.where(nib & 1, step >> 2, 0)
            + np.where(nib & 2, step >> 1, 0)
            + np.where(nib & 4, step, 0)
        )
        pred = np.where(nib & 8, pred - diff, pred + diff)
        np.clip(pred, -32768, 32767, out=pred)
        index = np.clip(index + idx_tab[nib], 0, 88)
        out[:, i + 1] = pred
    return out.reshape(-1).tolist()


def _ms_decode_blocks_np(
    body: bytes, block_align: int, channels: int
) -> list[int]:
    """Batch-decode FULL-SIZE MS-ADPCM blocks ACROSS blocks (r14, the
    r13 IMA batching applied to format 2): every block carries its own
    per-channel 7-byte header (predictor index, delta, sample1,
    sample2) and no state crosses block boundaries, so the per-nibble
    recursion runs once over a (n_blocks,)-wide numpy vector. Stereo
    batches too — channels alternate per nibble WITHIN a block, so the
    step loop just addresses the per-channel state column (the loop
    length 2*(block_align-7*C) is the serial floor either way).
    Bit-identical to _ms_decode_block (fuzz-pinned): same C-style
    truncate-toward-zero /256 prediction, clamps and adaptive-delta
    floor in int64. Returns the concatenated per-block sample lists."""
    n_blocks = len(body) // block_align
    arr = np.frombuffer(body, np.uint8)[: n_blocks * block_align]
    blocks = arr.reshape(n_blocks, block_align)
    ch = channels
    pidx = blocks[:, 0:ch].astype(np.int64)
    if (pidx >= len(_MS_COEFFS)).any():
        raise ValueError(
            f"MS-ADPCM: predictor index {int(pidx.max())} out of range"
        )
    coeffs = np.asarray(_MS_COEFFS, dtype=np.int64)
    c1 = coeffs[pidx, 0]
    c2 = coeffs[pidx, 1]

    def i16(off: int):
        lo = blocks[:, off : off + 2 * ch : 2].astype(np.int64)
        hi = blocks[:, off + 1 : off + 2 * ch : 2].astype(np.int64)
        v = lo | (hi << 8)
        return np.where(v >= 32768, v - 65536, v)

    delta = i16(ch)
    s1 = i16(3 * ch)
    s2 = i16(5 * ch)
    data = blocks[:, 7 * ch :]
    n_steps = data.shape[1] * 2
    # nibble matrix (n_blocks, n_steps): HIGH nibble first per byte
    # (the opposite of IMA), channels alternating per nibble
    nibs = np.empty((n_blocks, n_steps), dtype=np.int64)
    nibs[:, 0::2] = data >> 4
    nibs[:, 1::2] = data & 0x0F
    adapt = np.asarray(_MS_ADAPT, dtype=np.int64)
    out = np.empty((n_blocks, 2 * ch + n_steps), dtype=np.int64)
    # output starts with the two header samples per channel, OLDER
    # (sample2) first, channel-interleaved
    out[:, 0:ch] = s2
    out[:, ch : 2 * ch] = s1
    for i in range(n_steps):
        c = i % ch
        nib = nibs[:, i]
        signed = np.where(nib >= 8, nib - 16, nib)
        prod = s1[:, c] * c1[:, c] + s2[:, c] * c2[:, c]
        pred = (
            np.where(prod >= 0, prod // 256, -((-prod) // 256))
            + signed * delta[:, c]
        )
        np.clip(pred, -32768, 32767, out=pred)
        delta[:, c] = np.maximum(16, (adapt[nib] * delta[:, c]) >> 8)
        s2[:, c] = s1[:, c]
        s1[:, c] = pred
        out[:, 2 * ch + i] = pred
    return out.reshape(-1).tolist()


def _adpcm_sample_list(
    audio_format, channels, block_align, fact_samples, body
):
    """Shared MS/IMA-ADPCM block walk + fact-chunk trim. The per-
    nibble state machines are sequential WITHIN a block; mono IMA
    batches the recursion across full-size blocks via numpy
    (_ima_decode_blocks_np) when the stream is long enough to pay the
    vector overhead — a trailing short block and the other formats
    keep the scalar walk."""
    if audio_format == 2:
        samples = []
        start = 0
        n_full = len(body) // block_align
        if n_full >= IMA_BATCH_MIN_BLOCKS:
            samples.extend(
                _in_block_chunks(
                    body[: n_full * block_align],
                    block_align,
                    lambda b: _ms_decode_blocks_np(
                        b, block_align, channels
                    ),
                )
            )
            start = n_full * block_align
        for off in range(start, len(body), block_align):
            samples.extend(
                _ms_decode_block(body[off : off + block_align], channels)
            )
        if fact_samples is not None:
            want = fact_samples * channels
            if want > len(samples):
                raise ValueError(
                    "MS-ADPCM: fact chunk claims more samples "
                    "than the data chunk decodes"
                )
            samples = samples[:want]
        return samples
    decode_block = (
        _ima_decode_block_stereo if channels == 2 else _ima_decode_block
    )
    samples = []
    start = 0
    n_full = len(body) // block_align
    if channels == 1 and n_full >= IMA_BATCH_MIN_BLOCKS:
        samples.extend(
            _in_block_chunks(
                body[: n_full * block_align],
                block_align,
                lambda b: _ima_decode_blocks_np(b, block_align),
            )
        )
        start = n_full * block_align
    for off in range(start, len(body), block_align):
        samples.extend(decode_block(body[off : off + block_align]))
    if fact_samples is not None:
        # fact counts samples PER CHANNEL (frames)
        want = fact_samples * channels
        if want > len(samples):
            raise ValueError(
                "IMA-ADPCM: fact chunk claims more samples "
                "than the data chunk decodes"
            )
        samples = samples[:want]
    return samples


# G.711 expansion LUTs: the 256-entry segment arithmetic evaluated
# once at import; per-byte decode is then a single table gather
_G711_ALAW_NP = None
_G711_ULAW_NP = None


def _g711_luts():
    global _G711_ALAW_NP, _G711_ULAW_NP
    if _G711_ALAW_NP is None:
        _G711_ALAW_NP = np.array(
            [g711_alaw_to_linear(b) for b in range(256)], np.int64
        )
        _G711_ULAW_NP = np.array(
            [g711_ulaw_to_linear(b) for b in range(256)], np.int64
        )
    return _G711_ALAW_NP, _G711_ULAW_NP


def decode_wav_samples(payload: bytes) -> dict:
    """REAL sample decode: chunk walk to the data chunk, then unpack
    integer PCM (format 1: 8-bit unsigned / 16-bit signed), MS-ADPCM
    (format 2: coefficient prediction + adaptive delta), IEEE float
    (format 3: 32-bit little-endian), G.711 A-law/mu-law (formats
    6/7: CCITT segment arithmetic, r12: via the 256-entry LUT — same
    integers), or IMA ADPCM (format 17: 4-bit blocks with the fact
    chunk trimming end-of-stream padding; stereo decodes the 4-byte
    channel-word interleave). All decode mono or stereo, returned
    channel-interleaved as a Python list. Perceptual format tags
    (mp3-in-wav) raise NotImplementedError — the remaining audio
    boundary together with compressed video."""
    (
        audio_format, channels, sample_rate, block_align,
        bits, fact_samples, body,
    ) = _wav_walk(payload)
    if audio_format in (2, 17):
        samples = _adpcm_sample_list(
            audio_format, channels, block_align, fact_samples, body
        )
    elif audio_format == 3:
        samples = list(
            struct.unpack(f"<{len(body) // 4}f", body[: len(body) // 4 * 4])
        )
    elif audio_format in (6, 7):
        alaw, ulaw = _g711_luts()
        lut = alaw if audio_format == 6 else ulaw
        samples = np.take(lut, np.frombuffer(body, np.uint8)).tolist()
    elif bits == 8:
        samples = list(body)
    else:
        samples = list(
            struct.unpack(f"<{len(body) // 2}h", body[: len(body) // 2 * 2])
        )
    return {
        "sample_rate": sample_rate,
        "bits": bits,
        "channels": channels,
        "format": audio_format,
        "samples": samples,
    }


def decode_wav_samples_np(payload: bytes) -> dict:
    """Vectorized twin of ``decode_wav_samples`` (r12): identical walk
    and values, but ``samples`` is a numpy array — int64 for the
    integer formats, float64 for IEEE-float WAVs — so aggregating
    consumers skip the boxed-int list round-trip. ADPCM formats decode
    through the scalar state machine and convert once."""
    (
        audio_format, channels, sample_rate, block_align,
        bits, fact_samples, body,
    ) = _wav_walk(payload)
    if audio_format in (2, 17):
        samples = np.asarray(
            _adpcm_sample_list(
                audio_format, channels, block_align, fact_samples, body
            ),
            dtype=np.int64,
        )
    elif audio_format == 3:
        samples = np.frombuffer(
            body[: len(body) // 4 * 4], "<f4"
        ).astype(np.float64)
    elif audio_format in (6, 7):
        alaw, ulaw = _g711_luts()
        lut = alaw if audio_format == 6 else ulaw
        samples = np.take(lut, np.frombuffer(body, np.uint8))
    elif bits == 8:
        samples = np.frombuffer(body, np.uint8).astype(np.int64)
    else:
        samples = np.frombuffer(
            body[: len(body) // 2 * 2], "<i2"
        ).astype(np.int64)
    return {
        "sample_rate": sample_rate,
        "bits": bits,
        "channels": channels,
        "format": audio_format,
        "samples": samples,
    }


def _decode_one(media_type: str, codec: str, payload) -> dict:
    if payload is None:
        # failed upstream fetch: raise the same error family as the
        # codec parsers (ValueError), not a TypeError from bytes(None)
        raise ValueError("null media payload")
    payload = bytes(payload)
    if codec == "wav":
        hdr = parse_wav_header(payload)
        return {
            "n_bytes": len(payload),
            "width": 0,
            "height": 0,
            "duration_ms": hdr["duration_ms"],
            "n_frames": 0,
        }
    if codec == "png":
        hdr = parse_png_header(payload)
        return {
            "n_bytes": len(payload),
            "width": hdr["width"],
            "height": hdr["height"],
            "duration_ms": 0,
            "n_frames": 1,
        }
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
                _decode_one(mt, c, p)
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


# ---------------------------------------------------------------------------
# Pixel / sample statistics over REAL decodes (VERDICT r3 items 4+8):
# gradient PNGs and square-wave WAVs whose rasters/samples follow a
# closed form, so the oracle replays the *decoded* statistics — the
# Spark side must inflate+unfilter / walk+unpack to produce them.
# ---------------------------------------------------------------------------
GRAD_BASE_MOD = 200  # base + x + y <= 199 + 30 < 256: no 8-bit wrap
SQUARE_BASE_MOD = 200


def attach_payload_png_gradient(docs: DataFrame) -> DataFrame:
    """documents -> gradient PNGs (pixel = base + x + y, mixed
    None/Up filters, real deflate): dims from md5(text) like
    attach_payload_png, base = md5[9:10 hex] % 200."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                w = int(h[0:4], 16) % PNG_DIM_MOD + 1
                ht = int(h[4:8], 16) % PNG_DIM_MOD + 1
                base = int(h[8:10], 16) % GRAD_BASE_MOD
                payloads.append(encode_png_gradient(w, ht, base))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "image",
                    "codec": "png",
                    "payload": payloads,
                }
            )

    # heavy=False: the <=16x16 grayscale gradient assembly + decode is
    # trivial per row — the r8 unconditional fan-out shuffle cost more
    # than the decode saved (0.35 -> 0.93 s, the round's only
    # plan-changed regression; restored r9)
    return _fan_out(docs.select("doc_id", "text"), heavy=False).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


def attach_payload_png_depth_variants(docs: DataFrame) -> DataFrame:
    """documents -> the bit-depth/interlace corpus, doc_id % 4:
    0 = 16-bit grayscale gradients (encode_png_gray16),
    1 = Adam7-INTERLACED 8-bit gradients (encode_png_gray_interlaced,
    same pixel formula as the sequential gradient),
    2 = SUB-BYTE grayscale ((x+y) % 2^depth, depth 1/2/4 from md5),
    3 = SUB-BYTE palette (same indices through a PLTE) —
    dims/base/depth from md5(text) as everywhere. Map-only
    Arrow-batched build."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                w = int(h[0:4], 16) % PNG_DIM_MOD + 1
                ht = int(h[4:8], 16) % PNG_DIM_MOD + 1
                base = int(h[8:10], 16) % GRAD_BASE_MOD
                depth = (1, 2, 4)[int(h[10:12], 16) % 3]
                variant = int(doc_id) % 4
                if variant == 0:
                    payloads.append(encode_png_gray16(w, ht, base))
                elif variant == 1:
                    payloads.append(encode_png_gray_interlaced(w, ht, base))
                elif variant == 2:
                    payloads.append(encode_png_gray_subbyte(w, ht, depth))
                else:
                    payloads.append(encode_png_palette_subbyte(w, ht, depth))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "image",
                    "codec": "png",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


PIXEL_STATS_SCHEMA = (
    "doc_id long, width int, height int, n_pixels long, min_pixel int, "
    "max_pixel int, sum_pixel long, mean_pixel double"
)


def png_pixel_stats(media: DataFrame, box: int | None = None) -> DataFrame:
    """Arrow-batched REAL pixel statistics: inflate + unfilter each
    PNG payload (decode_png_pixels), optionally nearest-resample into
    a ``box`` (resample_nearest), then aggregate the raster. Map-only:
    no shuffle, linear in bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, ch, px = decode_png_pixels(bytes(p))
                if box is not None:
                    m = max(w, h)
                    tw = max(1, w * box // m)
                    th = max(1, h * box // m)
                    px = resample_nearest(px, w, h, tw, th, ch)
                    w, h = tw, th
                n = len(px)
                a = np.asarray(px)
                s = int(a.sum(dtype=np.int64))
                rows.append(
                    (
                        int(doc_id), w, h, n,
                        int(a.min()), int(a.max()), s, s / n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_pixels",
                    "min_pixel", "max_pixel", "sum_pixel", "mean_pixel",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=PIXEL_STATS_SCHEMA
    )


def attach_payload_wav_square(docs: DataFrame) -> DataFrame:
    """documents -> square-wave PCM WAVs: duration from md5 like
    attach_payload_wav, base level = md5[13:14 hex] % 200."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                dur = int(h[8:12], 16) % WAV_DUR_MOD + 1
                base = int(h[12:14], 16) % SQUARE_BASE_MOD
                payloads.append(encode_wav_square(dur, base))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "audio",
                    "codec": "wav",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


ADPCM_DUR_MOD = 250  # shorter clips than PCM: the per-nibble state
# machine is pure Python on both encode and decode, and the codec
# exercise (block walk, predictor tracking, fact trim) is identical at
# 250 ms and 2 s — only the test wall-clock differs


JPEG_BLOCKS_MOD = 4
JPEG_DC_RANGE = 49  # per-block dc in [-24, 24] -> values 80..176


def attach_payload_jpeg_blocks(docs: DataFrame) -> DataFrame:
    """documents -> baseline grayscale JPEGs of blockwise-constant
    images: (bw, bh) 8x8 blocks from md5, block b constant at
    128 + 2*k_b with k_b = ((base + b) mod 49) - 24. Even offsets
    quantize the DC exactly under the Annex-K table (Q0 = 16, DC =
    (v-128)*8, quantized (v-128)/2 — integer), and a constant block's
    float AC coefficients quantize to exactly 0 — so the lossy codec
    is bit-faithful on these images and the closed-form oracle holds,
    while decode still runs Huffman + dezigzag + dequant + IDCT."""
    from falcon_metrics_etl_spark.functions.jpeg import encode_jpeg_gray

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                bw = int(h[0:4], 16) % JPEG_BLOCKS_MOD + 1
                bh = int(h[4:8], 16) % JPEG_BLOCKS_MOD + 1
                base = int(h[8:10], 16)
                block_idx = np.add.outer(
                    np.arange(8 * bh) // 8 * bw, np.arange(8 * bw) // 8
                )
                img = 128 + 2 * (
                    ((base + block_idx) % JPEG_DC_RANGE) - 24
                )
                payloads.append(encode_jpeg_gray(img))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "image",
                    "codec": "jpeg",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


def jpeg_pixel_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL JPEG pixel statistics (baseline grayscale
    decode: Huffman entropy decode -> dequant -> IDCT -> raster)."""
    from falcon_metrics_etl_spark.functions.jpeg import decode_jpeg_gray

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_jpeg_gray(bytes(p))
                a = np.asarray(d["pixels"], dtype=np.int64)
                n = a.size
                s = int(a.sum())
                rows.append(
                    (
                        int(doc_id), d["width"], d["height"], n,
                        int(a.min()), int(a.max()), s, s / n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_pixels",
                    "min_pixel", "max_pixel", "sum_pixel", "mean_pixel",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        run,
        schema="doc_id long, width int, height int, n_pixels long, "
        "min_pixel int, max_pixel int, sum_pixel long, mean_pixel double",
    )


JPEG_CHROMA_RANGE = 41  # per-doc chroma offsets in [-20, 20]


def attach_payload_jpeg_color(docs: DataFrame) -> DataFrame:
    """documents -> 4:4:4 color JPEGs: per-block luma ramp (same
    block pattern as the grayscale query) + per-doc constant chroma
    (Cb, Cr = 128 + 2*{cb0, cr0}), encoded with Q0=16 quant tables
    for BOTH luma and chroma so every even DC offset quantizes
    exactly — the decode recovers the exact YCbCr planes and the
    RGB output is the pure JFIF conversion formula, replayable in
    SQL."""
    from falcon_metrics_etl_spark.functions.jpeg import (
        STD_QUANT,
        encode_jpeg_ycbcr,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                bw = int(h[0:4], 16) % JPEG_BLOCKS_MOD + 1
                bh = int(h[4:8], 16) % JPEG_BLOCKS_MOD + 1
                base = int(h[8:10], 16)
                cb = 128 + 2 * (int(h[10:12], 16) % JPEG_CHROMA_RANGE - 20)
                cr = 128 + 2 * (int(h[12:14], 16) % JPEG_CHROMA_RANGE - 20)
                y_plane = [
                    [
                        128 + 2 * (
                            ((base + (y // 8) * bw + (x // 8))
                             % JPEG_DC_RANGE) - 24
                        )
                        for x in range(8 * bw)
                    ]
                    for y in range(8 * bh)
                ]
                flat_cb = [[cb] * (8 * bw) for _ in range(8 * bh)]
                flat_cr = [[cr] * (8 * bw) for _ in range(8 * bh)]
                payloads.append(
                    encode_jpeg_ycbcr(
                        y_plane, flat_cb, flat_cr,
                        quant_y=STD_QUANT, quant_c=STD_QUANT,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "image",
                    "codec": "jpeg",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


def attach_payload_jpeg_color_progressive(docs: DataFrame) -> DataFrame:
    """documents -> PROGRESSIVE 4:4:4 color JPEGs: same per-block luma
    ramp + constant chroma construction as the baseline color corpus
    (exact recovery under Q0=16 on both tables), re-encoded as
    multi-scan SOF2 with an interleaved DC scan, per-component AC
    first/refinement scans and RSTn restarts every 3 units."""
    from falcon_metrics_etl_spark.functions.jpeg import (
        STD_QUANT,
        encode_jpeg_ycbcr_progressive,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                bw = int(h[0:4], 16) % JPEG_BLOCKS_MOD + 1
                bh = int(h[4:8], 16) % JPEG_BLOCKS_MOD + 1
                base = int(h[8:10], 16)
                cb = 128 + 2 * (int(h[10:12], 16) % JPEG_CHROMA_RANGE - 20)
                cr = 128 + 2 * (int(h[12:14], 16) % JPEG_CHROMA_RANGE - 20)
                y_plane = [
                    [
                        128 + 2 * (
                            ((base + (y // 8) * bw + (x // 8))
                             % JPEG_DC_RANGE) - 24
                        )
                        for x in range(8 * bw)
                    ]
                    for y in range(8 * bh)
                ]
                flat_cb = [[cb] * (8 * bw) for _ in range(8 * bh)]
                flat_cr = [[cr] * (8 * bw) for _ in range(8 * bh)]
                payloads.append(
                    encode_jpeg_ycbcr_progressive(
                        y_plane, flat_cb, flat_cr,
                        quant_y=STD_QUANT, quant_c=STD_QUANT,
                        restart_interval=3,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "image",
                    "codec": "jpeg-progressive",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


def attach_payload_jpeg_420(docs: DataFrame) -> DataFrame:
    """documents -> 4:2:0 subsampled color JPEGs: even block grids
    (16-px MCU alignment), the same per-block luma ramp and per-doc
    constant chroma as the 4:4:4 query — constant chroma makes the
    2x2 nearest upsample exact, so the oracle's closed form carries
    over while the decode exercises the real 4-luma-blocks-per-MCU
    interleave at half-resolution chroma."""
    from falcon_metrics_etl_spark.functions.jpeg import (
        STD_QUANT,
        encode_jpeg_ycbcr_420,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                bw = 2 * (int(h[0:4], 16) % 2 + 1)   # 2 or 4 blocks
                bh = 2 * (int(h[4:8], 16) % 2 + 1)
                base = int(h[8:10], 16)
                cb = 128 + 2 * (int(h[10:12], 16) % JPEG_CHROMA_RANGE - 20)
                cr = 128 + 2 * (int(h[12:14], 16) % JPEG_CHROMA_RANGE - 20)
                y_plane = [
                    [
                        128 + 2 * (
                            ((base + (y // 8) * bw + (x // 8))
                             % JPEG_DC_RANGE) - 24
                        )
                        for x in range(8 * bw)
                    ]
                    for y in range(8 * bh)
                ]
                half_cb = [[cb] * (4 * bw) for _ in range(4 * bh)]
                half_cr = [[cr] * (4 * bw) for _ in range(4 * bh)]
                payloads.append(
                    encode_jpeg_ycbcr_420(
                        y_plane, half_cb, half_cr,
                        quant_y=STD_QUANT, quant_c=STD_QUANT,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "image",
                    "codec": "jpeg",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


def attach_payload_jpeg_progressive(docs: DataFrame) -> DataFrame:
    """documents -> PROGRESSIVE (SOF2) grayscale JPEGs of the same
    blockwise-constant images as the baseline query: six scans (DC
    first Al=1, two spectral AC bands at Al=2, two full-band AC
    refinements, DC refinement) plus RSTn restarts every 5 blocks in
    every scan. Successive approximation reconstructs the quantized
    coefficients exactly, so the baseline query's closed-form oracle
    carries over unchanged while the decode runs the full T.81 Annex
    G scan machinery."""
    from falcon_metrics_etl_spark.functions.jpeg import (
        encode_jpeg_gray_progressive,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                bw = int(h[0:4], 16) % JPEG_BLOCKS_MOD + 1
                bh = int(h[4:8], 16) % JPEG_BLOCKS_MOD + 1
                base = int(h[8:10], 16)
                img = [
                    [
                        128 + 2 * (
                            ((base + (y // 8) * bw + (x // 8))
                             % JPEG_DC_RANGE) - 24
                        )
                        for x in range(8 * bw)
                    ]
                    for y in range(8 * bh)
                ]
                payloads.append(
                    encode_jpeg_gray_progressive(img, restart_interval=5)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "image",
                    "codec": "jpeg-progressive",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


def attach_payload_jpeg_420_progressive(docs: DataFrame) -> DataFrame:
    """documents -> PROGRESSIVE 4:2:0 JPEGs: same even-block-grid luma
    ramp + constant half-resolution chroma as the baseline 4:2:0
    corpus, re-encoded as multi-scan SOF2 (interleaved DC over the
    16-px MCU grid, per-component AC scans, RSTn every 3 units)."""
    from falcon_metrics_etl_spark.functions.jpeg import (
        STD_QUANT,
        encode_jpeg_ycbcr_420_progressive,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                bw = 2 * (int(h[0:4], 16) % 2 + 1)
                bh = 2 * (int(h[4:8], 16) % 2 + 1)
                base = int(h[8:10], 16)
                cb = 128 + 2 * (int(h[10:12], 16) % JPEG_CHROMA_RANGE - 20)
                cr = 128 + 2 * (int(h[12:14], 16) % JPEG_CHROMA_RANGE - 20)
                y_plane = [
                    [
                        128 + 2 * (
                            ((base + (y // 8) * bw + (x // 8))
                             % JPEG_DC_RANGE) - 24
                        )
                        for x in range(8 * bw)
                    ]
                    for y in range(8 * bh)
                ]
                half_cb = [[cb] * (4 * bw) for _ in range(4 * bh)]
                half_cr = [[cr] * (4 * bw) for _ in range(4 * bh)]
                payloads.append(
                    encode_jpeg_ycbcr_420_progressive(
                        y_plane, half_cb, half_cr,
                        quant_y=STD_QUANT, quant_c=STD_QUANT,
                        restart_interval=3,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "image",
                    "codec": "jpeg-progressive",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


def jpeg_rgb_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched color JPEG statistics: full baseline decode
    (3-component MCU interleave, per-component predictors/tables,
    YCbCr->RGB) then per-channel aggregates."""
    from falcon_metrics_etl_spark.functions.jpeg import decode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_jpeg(bytes(p))
                if d["ncomp"] != 3:
                    raise ValueError("expected a color JPEG")
                a = np.asarray(d["rgb"], dtype=np.int64)  # (h, w, 3)
                sums = a.sum(axis=(0, 1))
                rows.append(
                    (
                        int(doc_id), d["width"], d["height"],
                        d["width"] * d["height"],
                        int(a[..., 0].min()), int(a[..., 0].max()),
                        int(sums[0]), int(sums[1]), int(sums[2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_pixels",
                    "min_r", "max_r", "sum_r", "sum_g", "sum_b",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        run,
        schema="doc_id long, width int, height int, n_pixels long, "
        "min_r int, max_r int, sum_r long, sum_g long, sum_b long",
    )


def attach_payload_wav_ms_adpcm(docs: DataFrame) -> DataFrame:
    """documents -> MS-ADPCM WAVs carrying an amplitude-16 square wave
    (base, base+16 alternation): with predictor 0 (coeffs 256,0 — pure
    previous-sample prediction) and initial delta 16, the +/-16 steps
    quantize to nibbles +/-1 and the adaption table PINS delta at 16
    (230*16>>8 = 14 -> clamped 16), so the lossy codec is bit-faithful
    on this signal and the oracle's closed form holds — while decode
    still walks blocks, predictor state and the fact trim."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                dur = int(h[8:12], 16) % ADPCM_DUR_MOD + 1
                base = int(h[12:14], 16) % SQUARE_BASE_MOD
                n = WAV_SAMPLE_RATE * dur // 1000
                samples = [base + 16 * (i & 1) for i in range(n)]
                payloads.append(encode_wav_ms_adpcm(samples))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "audio",
                    "codec": "wav",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


G711_DUR_MOD = 500


def attach_payload_wav_g711(docs: DataFrame) -> DataFrame:
    """documents -> TWO G.711 WAVs per doc (one mu-law, one A-law)
    over the same deterministic byte ramp b_i = (base + 7*i) mod 256:
    a full-range companded sweep, so header math cannot fake the
    decoded statistics and every code point is exercised."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                dur = int(h[8:12], 16) % G711_DUR_MOD + 1
                base = int(h[12:14], 16)
                n = WAV_SAMPLE_RATE * dur // 1000
                data = bytes((base + 7 * i) & 0xFF for i in range(n))
                for law in ("ulaw", "alaw"):
                    rows.append(
                        (int(doc_id), law, encode_wav_g711(data, law))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "law", "payload"]
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, law string, payload binary"
    )


def wav_g711_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched G.711 sample statistics, one row per (doc, law)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, law, p in zip(
                pdf["doc_id"], pdf["law"], pdf["payload"]
            ):
                d = decode_wav_samples_np(bytes(p))
                s = d["samples"]
                if not len(s):
                    raise ValueError("WAV: empty data chunk")
                rows.append(
                    (
                        int(doc_id), law, len(s),
                        int(s.min()), int(s.max()), int(s.sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "law", "n_samples",
                    "min_sample", "max_sample", "sum_samples",
                ],
            )

    return media.mapInPandas(
        run,
        schema="doc_id long, law string, n_samples long, "
        "min_sample int, max_sample int, sum_samples long",
    )


def attach_payload_wav_adpcm(docs: DataFrame) -> DataFrame:
    """documents -> IMA-ADPCM WAVs carrying the SAME square wave as
    attach_payload_wav_square (duration md5[8:12] mod 250ms, base
    md5[12:14]).
    A +/-1 alternation at step index 0 quantizes EXACTLY (nibbles
    1/9 at step 7 reproduce +/-1 and hold the index), so the lossy
    codec is bit-faithful on this signal and the oracle's closed
    form stays valid — while the decode still has to walk blocks,
    track predictor state and trim via the fact chunk."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                dur = int(h[8:12], 16) % ADPCM_DUR_MOD + 1
                base = int(h[12:14], 16) % SQUARE_BASE_MOD
                n = WAV_SAMPLE_RATE * dur // 1000
                samples = [base + (i & 1) for i in range(n)]
                payloads.append(encode_wav_ima_adpcm(samples))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "audio",
                    "codec": "wav",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


WAV_STATS_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, duration_ms int, "
    "min_sample int, max_sample int, sum_samples long, mean_sample double"
)


def wav_sample_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL PCM sample statistics: chunk-walk + unpack
    (decode_wav_samples), then aggregate the samples; duration is
    re-derived from the decoded sample count, not the header."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_wav_samples_np(bytes(p))
                s = d["samples"]
                if not len(s):
                    # structurally valid WAV, zero-length data chunk:
                    # raise the documented malformed-payload family so
                    # the row is quarantine-able, not a bare
                    # ZeroDivision/ValueError from min([]) below
                    raise ValueError("WAV: empty data chunk")
                if s.dtype.kind != "i":
                    # IEEE-float WAV: keep the scalar left-to-right
                    # float sum (numpy's pairwise reduction could
                    # round differently)
                    s = decode_wav_samples(bytes(p))["samples"]
                    total = sum(s)
                    mn, mx = min(s), max(s)
                else:
                    total = int(s.sum())
                    mn, mx = int(s.min()), int(s.max())
                rows.append(
                    (
                        int(doc_id),
                        d["sample_rate"],
                        len(s),
                        len(s) * 1000 // d["sample_rate"],
                        mn,
                        mx,
                        total,
                        total / len(s),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "duration_ms",
                    "min_sample", "max_sample", "sum_samples", "mean_sample",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=WAV_STATS_SCHEMA
    )


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


# ---------------------------------------------------------------------------
# Color PNG decode (VERDICT r4 item 4): truecolor + palette corpora.
# ---------------------------------------------------------------------------
def attach_payload_png_color(docs: DataFrame) -> DataFrame:
    """documents -> color PNGs covering every supported 8-bit color
    type: doc_id % 4 picks truecolor RGB (0, encode_png_color),
    palette (1, encode_png_palette), RGBA (2, encode_png_rgba) or
    gray+alpha (3, encode_png_gray_alpha) — dims/base from md5(text)
    exactly like attach_payload_png_gradient, so every decoded
    statistic has an oracle-replayable closed form. Map-only
    Arrow-batched build."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                w = int(h[0:4], 16) % PNG_DIM_MOD + 1
                ht = int(h[4:8], 16) % PNG_DIM_MOD + 1
                base = int(h[8:10], 16) % GRAD_BASE_MOD
                variant = int(doc_id) % 4
                if variant == 0:
                    payloads.append(encode_png_color(w, ht, base))
                elif variant == 1:
                    payloads.append(encode_png_palette(w, ht))
                elif variant == 2:
                    payloads.append(encode_png_rgba(w, ht, base))
                else:
                    payloads.append(encode_png_gray_alpha(w, ht, base))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "image",
                    "codec": "png",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


COLOR_STATS_SCHEMA = (
    "doc_id long, color_type int, channels int, width int, height int, "
    "n_values long, min_value int, max_value int, sum_values long, "
    "mean_value double"
)


def png_color_pixel_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched color pixel statistics: decode_png_pixels handles
    grayscale/RGB/palette uniformly (palette rows PLTE-expand to RGB),
    stats aggregate the channel-interleaved raster. color_type is read
    from the actual IHDR, not assumed. Map-only: no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(p)
                ct = parse_png_header(payload)["color_type"]
                w, h, ch, px = decode_png_pixels(payload)
                n = len(px)
                a = np.asarray(px)
                s = int(a.sum(dtype=np.int64))
                rows.append(
                    (
                        int(doc_id), ct, ch, w, h, n,
                        int(a.min()), int(a.max()), s, s / n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "color_type", "channels", "width", "height",
                    "n_values", "min_value", "max_value", "sum_values",
                    "mean_value",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=COLOR_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — third real codec: an UNCOMPRESSED video container,
# fully decodable in pure stdlib (header tokens + fixed-size planar
# frames). Closes the "video frames" stub with a genuine format; the
# remaining media stubs are perceptual codecs only (mp3/h264) plus
# arithmetic-coded JPEG; baseline + progressive JPEG, grayscale and
# color, decode for real (jpeg.py).
# ---------------------------------------------------------------------------
Y4M_FRAMES_MOD = 8  # synthetic clips: 1..8 frames keeps payloads tiny

# frame payload bytes per pixel-count, by colour space (the chroma
# siting suffixes — jpeg/mpeg2/paldv — only move WHERE the chroma
# samples sit, not how many there are, so they share a stride)
_Y4M_FRAME_SIZE = {
    "mono": lambda w, h: w * h,
    "444": lambda w, h: 3 * w * h,
    "422": lambda w, h: w * h + 2 * ((w + 1) // 2) * h,
    "411": lambda w, h: w * h + 2 * ((w + 3) // 4) * h,
    "420jpeg": lambda w, h: w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2),
    "420mpeg2": lambda w, h: w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2),
    "420paldv": lambda w, h: w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2),
    "420": lambda w, h: w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2),
}


def encode_y4m_mono(width: int, height: int, n_frames: int, base: int) -> bytes:
    """Monochrome Y4M clip: frame k's pixel(x, y) = base + x + y + k
    (callers cap base at 199, dims at 16, frames at 8 — peak 237, no
    8-bit wrap, every statistic a closed form). Real spec layout:
    'YUV4MPEG2 W.. H.. F25:1 Ip A1:1 Cmono\\n' then per frame a
    'FRAME\\n' marker + w*h luma bytes."""
    hdr = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 Cmono\n".encode()
    grid = base + np.add.outer(
        np.arange(height, dtype=np.int64), np.arange(width, dtype=np.int64)
    )
    out = bytearray(hdr)
    for k in range(n_frames):
        out += b"FRAME\n"
        out += ((grid + k) & 0xFF).astype(np.uint8).tobytes()
    return bytes(out)


def encode_y4m_chroma(
    width: int,
    height: int,
    n_frames: int,
    base: int,
    cspace: str,
    chroma: int = 128,
) -> bytes:
    """Y4M clip with chroma planes: the SAME luma gradient as
    ``encode_y4m_mono`` plus constant Cb/Cr planes at the colour
    space's stride (422 half-width, 411 quarter-width, 420* 2x2,
    444 full) — so luma statistics stay the mono closed form while
    the decoder must stride past real chroma bytes per frame."""
    if cspace not in _Y4M_FRAME_SIZE or cspace == "mono":
        raise ValueError(f"encode_y4m_chroma: unsupported cspace {cspace!r}")
    hdr = (
        f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C{cspace}\n".encode()
    )
    chroma_bytes = _Y4M_FRAME_SIZE[cspace](width, height) - width * height
    grid = base + np.add.outer(
        np.arange(height, dtype=np.int64), np.arange(width, dtype=np.int64)
    )
    chroma_plane = bytes([chroma & 0xFF]) * chroma_bytes
    out = bytearray(hdr)
    for k in range(n_frames):
        out += b"FRAME\n"
        out += ((grid + k) & 0xFF).astype(np.uint8).tobytes()
        out += chroma_plane
    return bytes(out)


def parse_y4m_header(payload: bytes) -> dict:
    """Parse the YUV4MPEG2 stream header: width/height/fps/colour
    space. ValueError on non-Y4M bytes (quarantine-able)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M: bad magic")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("not a Y4M: unterminated stream header")
    w = h = None
    fps_num, fps_den, cspace = 25, 1, "420jpeg"  # spec defaults
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            fps_num, fps_den = (int(x) for x in t[1:].split(":"))
        elif t[0] == "C":
            cspace = t[1:]
    if not w or not h:
        raise ValueError("Y4M: missing W/H in stream header")
    return {
        "width": w,
        "height": h,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "cspace": cspace,
        "data_start": nl + 1,
    }


def decode_y4m_frames(payload: bytes) -> dict:
    """REAL frame decode: walk the FRAME markers and slice each
    fixed-size planar frame. Supported colour spaces: mono (luma
    only), 444, 420/420jpeg (luma plane returned; chroma skipped by
    size). Returns {width, height, fps_num, fps_den, n_frames,
    frames: [luma bytes per frame]}. Malformed frame markers or a
    truncated final frame raise ValueError."""
    hdr = parse_y4m_header(payload)
    cs = hdr["cspace"]
    if cs not in _Y4M_FRAME_SIZE:
        # STUB BOUNDARY: >8-bit taggings (e.g. 420p10/420p16) and
        # interlaced-chroma variants are out of scope; mono/444/422/
        # 411 and every 420 siting variant decode fully (r8)
        raise NotImplementedError(f"Y4M colour space {cs!r}")
    w, h = hdr["width"], hdr["height"]
    fsize = _Y4M_FRAME_SIZE[cs](w, h)
    luma = w * h
    pos = hdr["data_start"]
    frames = []
    while pos < len(payload):
        nl = payload.find(b"\n", pos)
        if nl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M: bad FRAME marker")
        pos = nl + 1  # frame-level params (rare) end at the newline
        if pos + fsize > len(payload):
            raise ValueError("Y4M: truncated frame")
        frames.append(payload[pos : pos + luma])
        pos += fsize
    return {
        "width": w,
        "height": h,
        "fps_num": hdr["fps_num"],
        "fps_den": hdr["fps_den"],
        "n_frames": len(frames),
        "frames": frames,
    }


Y4M_CSPACES = ("444", "422", "411", "420mpeg2")  # chroma-query rotation


def attach_payload_y4m_chroma(docs: DataFrame) -> DataFrame:
    """documents -> Y4M clips WITH chroma planes, colour space rotated
    per doc (444/422/411/420mpeg2 by md5[14:16]) — same luma gradient
    and dims as the mono corpus, so the mono closed-form oracle holds
    while the decode must stride each space's chroma layout."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                w = int(h[0:4], 16) % PNG_DIM_MOD + 1
                ht = int(h[4:8], 16) % PNG_DIM_MOD + 1
                base = int(h[8:10], 16) % GRAD_BASE_MOD
                n = int(h[12:14], 16) % Y4M_FRAMES_MOD + 1
                cs = Y4M_CSPACES[int(h[14:16], 16) % len(Y4M_CSPACES)]
                payloads.append(encode_y4m_chroma(w, ht, n, base, cs))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "video",
                    "codec": "y4m",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


def attach_payload_y4m(docs: DataFrame) -> DataFrame:
    """documents -> real monochrome Y4M clips: dims/base from md5(text)
    like the PNG corpora, n_frames = md5[12:14] % 8 + 1. Map-only
    Arrow-batched build."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                w = int(h[0:4], 16) % PNG_DIM_MOD + 1
                ht = int(h[4:8], 16) % PNG_DIM_MOD + 1
                base = int(h[8:10], 16) % GRAD_BASE_MOD
                n = int(h[12:14], 16) % Y4M_FRAMES_MOD + 1
                payloads.append(encode_y4m_mono(w, ht, n, base))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "video",
                    "codec": "y4m",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


Y4M_STATS_SCHEMA = (
    "doc_id long, width int, height int, n_frames int, fps double, "
    "n_luma long, min_luma int, max_luma int, sum_luma long, "
    "mean_luma double"
)


def y4m_frame_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL video stats: decode every frame's luma plane
    and aggregate across the whole clip. Map-only: no shuffle, linear
    in bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_y4m_frames(bytes(p))
                if not d["frames"]:
                    # header-only stream: structurally parseable but
                    # statless — same ValueError family as truncated
                    # media, never a ZeroDivisionError
                    raise ValueError("Y4M: zero-frame stream")
                n = d["n_frames"] * d["width"] * d["height"]
                luma = np.frombuffer(b"".join(d["frames"]), np.uint8)
                mn = int(luma.min())
                mx = int(luma.max())
                sm = int(luma.sum(dtype=np.int64))
                rows.append(
                    (
                        int(doc_id), d["width"], d["height"], d["n_frames"],
                        d["fps_num"] / d["fps_den"], n, mn, mx, sm, sm / n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_frames", "fps",
                    "n_luma", "min_luma", "max_luma", "sum_luma",
                    "mean_luma",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=Y4M_STATS_SCHEMA
    )


Y4M_SAMPLE_EVERY = 2

FRAME_SAMPLE_SCHEMA = (
    "doc_id long, frame_idx int, sum_luma long, mean_luma double"
)


def y4m_sampled_frame_stats(media: DataFrame, every: int = Y4M_SAMPLE_EVERY) -> DataFrame:
    """Frame-sampling over REAL video: keep every ``every``-th frame
    (the standard training-data frame-subsample stage) and emit one
    row per sampled frame with its luma stats — the binary->frames
    fan-out running on an actual container, not the synthetic stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_y4m_frames(bytes(p))
                n = d["width"] * d["height"]
                for k in range(0, d["n_frames"], every):
                    sm = int(
                        np.frombuffer(d["frames"][k], np.uint8).sum(
                            dtype=np.int64
                        )
                    )
                    rows.append((int(doc_id), k, sm, sm / n))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "sum_luma", "mean_luma"],
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


# ---------------------------------------------------------------------------
# Audio preprocessing: silence trim (the lead/tail-strip stage an
# audio training pipeline runs before feature extraction).
# ---------------------------------------------------------------------------
WAV_SILENCE = 128  # 8-bit PCM midpoint


def encode_wav_padded(
    dur_ms: int, base: int, lead_ms: int, tail_ms: int
) -> bytes:
    """8 kHz mono 8-bit PCM WAV with lead/tail silence (midpoint 128)
    around a base/base+1 square wave — callers cap base below 100 so
    signal never equals silence and trim math stays exact (8 samples
    per ms at 8 kHz)."""
    body = (
        bytes([WAV_SILENCE]) * (8 * lead_ms)
        + bytes([base, base + 1]) * (4 * dur_ms)
        + bytes([WAV_SILENCE]) * (8 * tail_ms)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_SAMPLE_RATE, WAV_SAMPLE_RATE, 1, 8)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def trim_silence(samples, silence: int = WAV_SILENCE) -> tuple[int, int, int]:
    """(lead, signal, tail) sample counts after trimming leading and
    trailing runs of the exact silence level. All-silence clips report
    (n, 0, 0). Accepts a list or a numpy array (r12: vectorized
    first/last nonzero — same counts)."""
    n = len(samples)
    nz = np.flatnonzero(np.asarray(samples) != silence)
    if nz.size == 0:
        return n, 0, 0
    first = int(nz[0])
    last = int(nz[-1])
    return first, last - first + 1, n - 1 - last


def attach_payload_wav_padded(docs: DataFrame) -> DataFrame:
    """documents -> silence-padded square-wave WAVs: signal duration,
    base level and lead/tail padding all derive from md5(text)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5(text.encode("utf-8")).hexdigest()
                dur = int(h[8:12], 16) % 500 + 1
                base = int(h[12:14], 16) % 100
                lead = int(h[14:16], 16) % 50
                tail = int(h[16:18], 16) % 50
                payloads.append(encode_wav_padded(dur, base, lead, tail))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "audio",
                    "codec": "wav",
                    "payload": payloads,
                }
            )

    return _fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, media_type string, codec string, payload binary"
    )


TRIM_SCHEMA = (
    "doc_id long, total_ms long, lead_silence_ms long, signal_ms long, "
    "tail_silence_ms long"
)


def wav_silence_trim_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL trim: decode the PCM samples, strip
    exact-silence lead/tail runs, report millisecond spans (8 kHz:
    8 samples per ms). Map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_wav_samples_np(bytes(p))
                lead, sig, tail = trim_silence(d["samples"])
                rows.append(
                    (
                        int(doc_id), len(d["samples"]) // 8,
                        lead // 8, sig // 8, tail // 8,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "total_ms", "lead_silence_ms", "signal_ms",
                    "tail_silence_ms",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=TRIM_SCHEMA
    )


# ---------------------------------------------------------------------------
# Perceptual dHash: cross-codec image near-dup fingerprinting
# ---------------------------------------------------------------------------
# The grid is the classic dHash shape: sample a 9x8 luma grid, emit one
# bit per horizontal gradient (64 bits). Cell = (w // 9) x (h // 8)
# pixels; equal-size cells make the mean comparison identical to the
# exact integer SUM comparison, so no floats enter the fingerprint.
DHASH_GRID_W = 9
DHASH_GRID_H = 8
DHASH_GROUP = 4       # docs per content group: variant = doc_id % 4
DHASH_DC_RANGE = 49   # block offsets in [-24, 24]: the JPEG-exact envelope
DHASH_EDIT_MOD = 29   # variant v re-draws blocks where md5 % 29 < v


def dhash_block_value(g: int, v: int, bx: int, by: int) -> int:
    """Closed-form luma of 8x8 block (bx, by) for content group ``g``,
    variant ``v`` — replayed verbatim by the DuckDB oracle via
    md5(g || ':' || bx || ':' || by). Blocks draw a uniform value from
    the md5; variant v REPLACES the blocks whose edit-gate hex is
    < v with an independent draw (a sparse, real image edit: v=0 is
    the anchor, v=3 redraws ~10%% of blocks), so within-group Hamming
    distances spread over 0..~14 while cross-group hashes are
    independent 64-bit draws. Values are 128 + 2k, |k| <= 24 — even
    offsets quantize exactly under the Annex-K JPEG table (see
    attach_payload_jpeg_blocks), keeping the lossy codec bit-faithful."""
    h = hashlib.md5(f"{g}:{bx}:{by}".encode()).hexdigest()
    if int(h[4:6], 16) % DHASH_EDIT_MOD < v:
        k = int(h[6:10], 16) % DHASH_DC_RANGE - 24
    else:
        k = int(h[0:4], 16) % DHASH_DC_RANGE - 24
    return 128 + 2 * k


def encode_png_gray_raster(rows) -> bytes:
    """8-bit grayscale PNG of an arbitrary raster (list of rows or a
    2-D uint8 ndarray). Scanline filters cycle through all five types,
    IDAT is a real deflate stream — decoding has to genuinely
    unfilter, same contract as the gradient encoders. Vectorized
    (r12): forward filters read only ORIGINAL pixels, so all five
    predictor planes compute in one whole-image int16 pass and row y
    selects plane y % 5 — byte-identical to the per-row
    _filter_scanline loop it replaces."""
    img = np.asarray(rows, dtype=np.uint8)
    height, width = img.shape
    cur = img.astype(np.int16)
    up = np.zeros_like(cur)
    up[1:] = cur[:-1]
    left = np.zeros_like(cur)
    left[:, 1:] = cur[:, :-1]
    ul = np.zeros_like(cur)
    ul[1:, 1:] = cur[:-1, :-1]
    preds = np.stack(
        [
            np.zeros_like(cur),
            left,
            up,
            (left + up) >> 1,
            _paeth_np(left, up, ul),
        ]
    )
    fts = (np.arange(height) % 5).astype(np.uint8)
    sel = preds[fts, np.arange(height)]
    raw = np.empty((height, width + 1), np.uint8)
    raw[:, 0] = fts
    raw[:, 1:] = ((cur - sel) & 0xFF).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def attach_payload_dhash_corpus(docs: DataFrame) -> DataFrame:
    """documents -> the cross-codec near-dup image corpus: each group
    of DHASH_GROUP consecutive doc_ids shares one blockwise-constant
    72x64 luma surface (dhash_block_value), lightly edited per
    variant; EVEN doc_ids ship as PNG (all five scanline filters),
    ODD as baseline JPEG (blockwise-constant => DC-only, bit-faithful
    under Annex-K quantization). The same picture saved through two
    codecs is exactly the duplicate class a multimodal training
    corpus must catch — byte-level dedup can never pair them."""
    from falcon_metrics_etl_spark.functions.jpeg import encode_jpeg_gray

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                g, v = divmod(doc_id, DHASH_GROUP)
                # one md5 draw PER BLOCK, expanded to pixels — not one
                # per pixel (r11: the per-pixel form recomputed each
                # block's md5 64x and dominated the whole media bench
                # at ~74% of pair-query cost; identical raster).
                # r12: the 8x8 expansion is a numpy repeat.
                bv = np.empty(
                    (DHASH_GRID_H, DHASH_GRID_W), np.uint8
                )
                for by in range(DHASH_GRID_H):
                    for bx in range(DHASH_GRID_W):
                        bv[by, bx] = dhash_block_value(g, v, bx, by)
                img = np.repeat(np.repeat(bv, 8, axis=0), 8, axis=1)
                if doc_id % 2 == 0:
                    rows_out.append(
                        (doc_id, "image", "png", encode_png_gray_raster(img))
                    )
                else:
                    rows_out.append(
                        (doc_id, "image", "jpeg", encode_jpeg_gray(img))
                    )
            yield pd.DataFrame(
                rows_out,
                columns=["doc_id", "media_type", "codec", "payload"],
            )

    return _fan_out(docs.select("doc_id")).mapInPandas(
        run,
        schema="doc_id long, media_type string, codec string, payload binary",
    )


def dhash_cell_sums(px, w: int, h: int) -> list:
    """Exact integer cell sums of a flat grayscale raster over the
    9x8 dHash grid (cell = w//9 x h//8 pixels, image cropped to the
    grid): one list of DHASH_GRID_W sums per grid row. The shared
    quantity under BOTH the dHash bits (pairwise comparisons) and the
    detail score (pairwise absolute gradients)."""
    sx = w // DHASH_GRID_W
    sy = h // DHASH_GRID_H
    if sx == 0 or sy == 0:
        raise ValueError("dhash: image below the 9x8 grid")
    # vectorized (r12): one reshape + int64 block-sum — exact integer
    # sums, identical to the nested slice loop it replaces
    if isinstance(px, (bytes, bytearray, memoryview)):
        a = np.frombuffer(px, np.uint8)
    else:
        a = np.asarray(px)
    if a.ndim == 1:
        a = a.reshape(h, w)
    crop = a[: DHASH_GRID_H * sy, : DHASH_GRID_W * sx]
    sums = crop.reshape(DHASH_GRID_H, sy, DHASH_GRID_W, sx).sum(
        axis=(1, 3), dtype=np.int64
    )
    return sums.tolist()


def dhash64_of_cells(cell_rows) -> int:
    """dHash bits from precomputed cell sums: bit (by*8 + bx) set iff
    cell (bx+1, by) outweighs cell (bx, by); signed two's-complement
    long."""
    u = 0
    for by, sums in enumerate(cell_rows):
        for bx in range(DHASH_GRID_W - 1):
            if sums[bx + 1] > sums[bx]:
                u |= 1 << (by * 8 + bx)
    if u >= 1 << 63:
        u -= 1 << 64
    return u


def detail_of_cells(cell_rows) -> int:
    """Detail (sharpness proxy) from precomputed cell sums: the total
    absolute horizontal gradient magnitude the dHash THRESHOLDS —
    sum of |cell(bx+1) - cell(bx)| over the same 8x8 neighbor pairs.
    A blurrier / more-compressed variant of the same picture scores
    lower; exact integers, so the oracle replays it from the block
    constants (cell sum = 64 * block value on this corpus)."""
    d = 0
    for sums in cell_rows:
        for bx in range(DHASH_GRID_W - 1):
            d += abs(sums[bx + 1] - sums[bx])
    return d


def dhash64_of_raster(px, w: int, h: int) -> int:
    """64-bit dHash of a flat grayscale raster: crop to the 9x8 cell
    grid (cell = w//9 x h//8), exact integer cell sums, bit
    (by*8 + bx) set iff cell (bx+1, by) outweighs cell (bx, by);
    returned as a signed two's-complement long. Shared by the image
    fingerprint and the per-frame video fingerprint."""
    return dhash64_of_cells(dhash_cell_sums(px, w, h))


DHASH_SCHEMA = "doc_id long, codec string, width int, height int, dhash long"
DHASH_DETAIL_SCHEMA = DHASH_SCHEMA + ", detail long"


def media_dhash(media: DataFrame, with_detail: bool = False) -> DataFrame:
    """Arrow-batched perceptual fingerprint over REAL decodes: PNG via
    zlib inflate + scanline unfilter, JPEG via Huffman entropy decode
    + dequant + IDCT — then the 9x8 dHash: crop to (w//9*9, h//8*8),
    exact integer cell sums, bit (by*8 + bx) set iff cell (bx+1, by)
    outweighs cell (bx, by). The unsigned 64-bit value is emitted as
    a signed long (two's complement), matching the oracle's two-half
    reconstruction. With ``with_detail`` the same cell sums also emit
    the detail score (total |horizontal gradient|, detail_of_cells) —
    the keep-best quality column, at zero extra decode cost.
    Map-only: no shuffle, linear in bytes."""
    from falcon_metrics_etl_spark.functions.jpeg import decode_jpeg_gray

    cols = ["doc_id", "codec", "width", "height", "dhash"] + (
        ["detail"] if with_detail else []
    )

    def one(doc_id, codec, payload):
        if codec == "png":
            w, h, ch, px = decode_png_pixels(bytes(payload))
            if ch != 1:
                raise ValueError("media_dhash: grayscale PNG expected")
        else:
            d = decode_jpeg_gray(bytes(payload))
            w, h = d["width"], d["height"]
            px = d["pixels"]  # 2-D rows; dhash_cell_sums takes both
        try:
            cells = dhash_cell_sums(px, w, h)
        except ValueError as e:
            raise ValueError(f"media_dhash: {e}") from e
        u = dhash64_of_cells(cells)
        row = (int(doc_id), codec, w, h, u)
        if with_detail:
            row = row + (detail_of_cells(cells),)
        return row

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    one(i, c, p)
                    for i, c, p in zip(
                        pdf["doc_id"], pdf["codec"], pdf["payload"]
                    )
                ],
                columns=cols,
            )

    return media.select("doc_id", "codec", "payload").mapInPandas(
        run, schema=DHASH_DETAIL_SCHEMA if with_detail else DHASH_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video perceptual fingerprint: per-frame dHash over decoded Y4M luma
# ---------------------------------------------------------------------------
VIDEO_GROUP = 3    # docs per clip group: variant = doc_id % 3
VIDEO_FRAMES = 6   # frames per clip
# variant v drops the base clip's first v frames and appends v fresh
# ones — a TRIMMED/EXTENDED edit: v=1 shares 5 of 6 frames with the
# anchor, v=2 shares 4; cross-group clips share none (md5-unique)


def video_block_value(fkey: str, bx: int, by: int) -> int:
    """Closed-form luma of 8x8 block (bx, by) of the frame with
    logical content key ``fkey`` — one md5 draw, uniform 0..255,
    replayed verbatim by the DuckDB oracle."""
    h = hashlib.md5(f"{fkey}:{bx}:{by}".encode()).hexdigest()
    return int(h[0:2], 16)


def video_frame_keys(doc_id: int) -> list[str]:
    """Logical content keys of doc ``doc_id``'s frames: slot s takes
    the GROUP frame (v + s) while s < VIDEO_FRAMES - v, else a fresh
    doc-keyed frame — the trim-and-extend variant model."""
    g, v = divmod(int(doc_id), VIDEO_GROUP)
    return [
        f"G{g}:{v + s}" if s < VIDEO_FRAMES - v else f"D{doc_id}:{s}"
        for s in range(VIDEO_FRAMES)
    ]


def encode_y4m_mono_raster(width: int, height: int, frames) -> bytes:
    """Monochrome Y4M clip from explicit luma planes (``frames`` =
    list of w*h-byte planes) — the raster sibling of encode_y4m_mono,
    same spec layout."""
    hdr = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 Cmono\n".encode()
    out = bytearray(hdr)
    for plane in frames:
        if len(plane) != width * height:
            raise ValueError("Y4M raster: plane size mismatch")
        out += b"FRAME\n"
        out += plane
    return bytes(out)


def attach_payload_video_clips(docs: DataFrame) -> DataFrame:
    """documents -> the video near-dup corpus: groups of VIDEO_GROUP
    consecutive doc_ids share one 6-frame 72x64 blockwise-constant
    clip; variant v trims the first v frames and appends v fresh ones
    (video_frame_keys). Real Y4M layout, decoded by the real frame
    walker."""
    w = 8 * DHASH_GRID_W
    h = 8 * DHASH_GRID_H

    def plane(fkey: str) -> bytes:
        bv = np.empty((DHASH_GRID_H, DHASH_GRID_W), np.uint8)
        for by in range(DHASH_GRID_H):
            for bx in range(DHASH_GRID_W):
                bv[by, bx] = video_block_value(fkey, bx, by)
        return np.repeat(np.repeat(bv, 8, axis=0), 8, axis=1).tobytes()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                frames = [plane(k) for k in video_frame_keys(doc_id)]
                rows_out.append(
                    (
                        doc_id,
                        "video",
                        "y4m",
                        encode_y4m_mono_raster(w, h, frames),
                    )
                )
            yield pd.DataFrame(
                rows_out,
                columns=["doc_id", "media_type", "codec", "payload"],
            )

    return _fan_out(docs.select("doc_id")).mapInPandas(
        run,
        schema="doc_id long, media_type string, codec string, payload binary",
    )


VIDEO_DHASH_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, frame_dhash long"
)


def video_frame_dhash(media: DataFrame) -> DataFrame:
    """Arrow-batched per-frame perceptual fingerprint: decode the Y4M
    frame stream (real marker walk) and dHash every luma plane — one
    output row per frame. Map-only; at 100 TB this is the
    frame-fingerprint extraction stage of a video dedup index."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_y4m_frames(bytes(p))
                w, h = d["width"], d["height"]
                for i, plane in enumerate(d["frames"]):
                    rows.append(
                        (int(doc_id), i, w, h, dhash64_of_raster(plane, w, h))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height", "frame_dhash",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=VIDEO_DHASH_SCHEMA
    )


# ---------------------------------------------------------------------------
# Cross-modal fixture: keyframe thumbnails — a clip frame exported as a
# still image (r11 verdict "what's missing" #1: one of the most common
# duplicate classes in web corpora)
# ---------------------------------------------------------------------------
CM_THUMB_MOD = 7  # every 7th doc exports a keyframe thumbnail


def thumb_slot(doc_id: int) -> int:
    """Which frame of its own clip a thumbnail doc exports — varies
    with doc_id so the matched slot isn't constant; replayed by the
    oracle as (doc_id // 7) % VIDEO_FRAMES."""
    return (doc_id // CM_THUMB_MOD) % VIDEO_FRAMES


def attach_payload_keyframe_thumbs(docs: DataFrame) -> DataFrame:
    """documents -> the cross-modal near-dup corpus: every
    CM_THUMB_MOD-th doc exports ONE keyframe of its own fixture clip
    (slot thumb_slot(doc_id) of attach_payload_video_clips' clip for
    the same doc_id) as a grayscale PNG — the luma surface is the
    frame's, byte for byte, so the STILL's image dHash equals the
    clip's frame fingerprint only if both codec paths decode
    faithfully. Real PNG encode (all five scanline filters, real
    deflate), decoded by the real unfilter path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                if doc_id % CM_THUMB_MOD != 0:
                    continue
                fkey = video_frame_keys(doc_id)[thumb_slot(doc_id)]
                img = []
                for by in range(DHASH_GRID_H):
                    row: list = []
                    for bx in range(DHASH_GRID_W):
                        row.extend([video_block_value(fkey, bx, by)] * 8)
                    img.extend([row] * 8)
                rows_out.append(
                    (doc_id, "image", "png", encode_png_gray_raster(img))
                )
            yield pd.DataFrame(
                rows_out,
                columns=["doc_id", "media_type", "codec", "payload"],
            )

    return _fan_out(docs.select("doc_id")).mapInPandas(
        run,
        schema="doc_id long, media_type string, codec string, payload binary",
    )


# ---------------------------------------------------------------------------
# Audio perceptual fingerprint: window-energy gradient over decoded PCM
# ---------------------------------------------------------------------------
AUDIO_GROUP = 4      # docs per clip group: variant = doc_id % 4
AUDIO_SEGMENTS = 65  # constant-amplitude segments -> 64 gradient bits
AUDIO_SEG_LEN = 64   # samples per segment == fingerprint window
AUDIO_EDIT_MOD = 29  # variant v redraws segments where md5 % 29 < v


def audio_segment_value(g: int, v: int, s: int) -> int:
    """Closed-form signed amplitude of segment ``s`` for content group
    ``g``, variant ``v`` — one md5 draw in [-8000, 8000], sparse
    per-variant redraws (same family as dhash_block_value), replayed
    verbatim by the DuckDB oracle."""
    h = hashlib.md5(f"A{g}:{s}".encode()).hexdigest()
    if int(h[4:6], 16) % AUDIO_EDIT_MOD < v:
        return int(h[6:10], 16) % 16001 - 8000
    return int(h[0:4], 16) % 16001 - 8000


def encode_wav_pcm16(samples) -> bytes:
    """Mono 16-bit signed PCM WAV (8 kHz) from explicit samples —
    the int16 sibling of encode_wav_square's 8-bit container."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, 1, WAV_SAMPLE_RATE, WAV_SAMPLE_RATE * 2, 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def recording_samples(doc_id: int) -> list:
    """The fixture recording's PCM surface for ``doc_id`` — ONE
    definition shared by attach_payload_audio_clips (the standalone
    recording) and attach_payload_soundtrack_wavs (the clip's rip):
    the cross-modal oracle derives track hashes from the audio CTE on
    the premise that the two streams are identical by construction,
    so the synthesis must not be duplicated."""
    g, v = divmod(doc_id, AUDIO_GROUP)
    samples = []
    for s in range(AUDIO_SEGMENTS):
        samples.extend([audio_segment_value(g, v, s)] * AUDIO_SEG_LEN)
    return samples


def attach_payload_audio_clips(docs: DataFrame) -> DataFrame:
    """documents -> the audio near-dup corpus: groups of AUDIO_GROUP
    consecutive doc_ids share one segment-constant 16-bit PCM clip
    (AUDIO_SEGMENTS segments x AUDIO_SEG_LEN samples); variant v
    redraws a sparse segment subset — the clipped/re-levelled edit
    class. PCM is lossless, so decode is bit-exact by construction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rows_out.append(
                    (doc_id, "audio", "wav",
                     encode_wav_pcm16(recording_samples(doc_id)))
                )
            yield pd.DataFrame(
                rows_out,
                columns=["doc_id", "media_type", "codec", "payload"],
            )

    return _fan_out(docs.select("doc_id")).mapInPandas(
        run,
        schema="doc_id long, media_type string, codec string, payload binary",
    )


# ---------------------------------------------------------------------------
# Cross-modal audio (r13): a clip's soundtrack ripped to a standalone
# WAV — podcast clips, music rips — the audio analog of the keyframe
# thumbnails above. The extracted track carries the SAME PCM stream as
# its doc's fixture recording (attach_payload_audio_clips), but in a
# re-authored RIFF container (a LIST/INFO metadata chunk between fmt
# and data, the layout real rip tools emit), so matching it to the
# recording requires the chunk walk + PCM decode to be faithful — the
# files are NOT byte-identical, only their decoded streams are.
# ---------------------------------------------------------------------------
CM_TRACK_MOD = 9  # every 9th doc's clip ships its soundtrack as a WAV


def encode_wav_pcm16_tagged(samples) -> bytes:
    """Mono 16-bit PCM WAV with a LIST/INFO chunk ahead of the data
    chunk — same decoded stream as encode_wav_pcm16, different
    container bytes; exercises the decoder's unknown-chunk skip."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, 1, WAV_SAMPLE_RATE, WAV_SAMPLE_RATE * 2, 2, 16
    )
    info = b"INFOISFT" + struct.pack("<I", 8) + b"trackrip"
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"LIST"
        + struct.pack("<I", len(info))
        + info
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def attach_payload_soundtrack_wavs(docs: DataFrame) -> DataFrame:
    """documents -> the cross-modal audio corpus: every CM_TRACK_MOD-th
    doc exports its clip's soundtrack — the audio surface of the SAME
    doc_id's fixture recording (group doc_id // AUDIO_GROUP, variant
    doc_id % AUDIO_GROUP) — as a standalone re-containerized PCM WAV.
    The track's spectral fingerprint equals the recording's sphash row
    only if the engine walks the extra LIST chunk and decodes the PCM
    bit-exactly; the oracle derives track hashes from the audio CTE
    (the streams are shared by construction), mirroring the keyframe
    thumbnail oracle (_DUCK_THUMBS)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                if doc_id % CM_TRACK_MOD != 0:
                    continue
                rows_out.append(
                    (doc_id, "audio", "wav",
                     encode_wav_pcm16_tagged(recording_samples(doc_id)))
                )
            yield pd.DataFrame(
                rows_out,
                columns=["doc_id", "media_type", "codec", "payload"],
            )

    return _fan_out(docs.select("doc_id")).mapInPandas(
        run,
        schema="doc_id long, media_type string, codec string, payload binary",
    )


AUDIO_FP_SCHEMA = (
    "doc_id long, n_samples long, sample_rate int, ahash long"
)


def audio_energy_dhash(media: DataFrame) -> DataFrame:
    """Arrow-batched audio fingerprint over REAL PCM decodes: window
    the sample stream at AUDIO_SEG_LEN, exact integer energy
    (sum |x|) per window, one bit per adjacent-window gradient — the
    dHash idea on the time axis. (Production audio fingerprints hash
    spectrogram bands; the windowing, gradient and banding plumbing
    here is exactly that shape with the FFT as the swap-in.) First
    65 windows -> 64 bits, signed-64 like the image hash. Map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_wav_samples_np(bytes(p))
                xs = d["samples"].astype(np.int64, copy=False)
                n_win = min(len(xs) // AUDIO_SEG_LEN, AUDIO_SEGMENTS)
                if n_win < 2:
                    raise ValueError("audio fingerprint: clip too short")
                # exact int64 window energies (r12: one reshape+sum,
                # same integers as the per-sample abs loop)
                energies = (
                    np.abs(xs[: n_win * AUDIO_SEG_LEN])
                    .reshape(n_win, AUDIO_SEG_LEN)
                    .sum(axis=1)
                )
                u = 0
                for i in range(n_win - 1):
                    if energies[i + 1] > energies[i]:
                        u |= 1 << i
                if u >= 1 << 63:
                    u -= 1 << 64
                rows.append(
                    (int(doc_id), len(xs), d["sample_rate"], u)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sample_rate", "ahash"],
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=AUDIO_FP_SCHEMA
    )


# ---------------------------------------------------------------------------
# Audio SPECTRAL fingerprint: exact fixed-point DFT band energies over
# overlapping PCM windows (the production swap-in the energy-gradient
# hash documents), r11
# ---------------------------------------------------------------------------
AUDIO_FFT_N = 128      # window length in samples (2 segments), stride 64
AUDIO_FFT_HOP = 64     # 50% overlap
AUDIO_FFT_BINS = 8     # non-DC bins k = 1..8 feed the band energy
AUDIO_FFT_SCALE = 64   # fixed-point twiddle scale (6 fractional bits)


def audio_fft_twiddles() -> tuple[list[int], list[int]]:
    """Pinned integer twiddle table: T_re[m] = round(cos(2*pi*m/N)*S),
    T_im[m] = -round(sin(2*pi*m/N)*S) for m = 0..N-1. The table is a
    FIXED constant of the fingerprint definition — the engine computes
    the DFT with it over real decoded samples, and the oracle embeds
    the DERIVED half-window sums (audio_fft_halfsums), so cross-engine
    parity never rides on trig evaluation."""
    import math as _m

    tre = [
        int(_m.floor(_m.cos(2 * _m.pi * m / AUDIO_FFT_N)
                     * AUDIO_FFT_SCALE + 0.5))
        for m in range(AUDIO_FFT_N)
    ]
    tim = [
        -int(_m.floor(_m.sin(2 * _m.pi * m / AUDIO_FFT_N)
                      * AUDIO_FFT_SCALE + 0.5))
        for m in range(AUDIO_FFT_N)
    ]
    return tre, tim


def audio_fft_halfsums() -> list[tuple[int, int, int, int]]:
    """(PR, PI, QR, QI) per bin k = 1..AUDIO_FFT_BINS: the twiddle
    sums over the window's first and second halves. For a window
    whose halves are constant amplitudes (A, B) — the fixture's shape
    by construction — linearity gives X_k = A*(PR,PI) + B*(QR,QI)
    EXACTLY, which is what the DuckDB oracle replays; the engine
    computes the full per-sample DFT and must land on the same
    integers."""
    tre, tim = audio_fft_twiddles()
    out = []
    for k in range(1, AUDIO_FFT_BINS + 1):
        pr = sum(tre[(k * n) % AUDIO_FFT_N] for n in range(64))
        pi = sum(tim[(k * n) % AUDIO_FFT_N] for n in range(64))
        qr = sum(tre[(k * n) % AUDIO_FFT_N] for n in range(64, 128))
        qi = sum(tim[(k * n) % AUDIO_FFT_N] for n in range(64, 128))
        out.append((pr, pi, qr, qi))
    return out


AUDIO_SPECTRAL_SCHEMA = "doc_id long, n_windows int, sphash long"


def audio_spectral_dhash(media: DataFrame) -> DataFrame:
    """Arrow-batched SPECTRAL audio fingerprint over REAL PCM decodes:
    overlapping AUDIO_FFT_N-sample windows (hop AUDIO_FFT_HOP), exact
    integer fixed-point DFT per window (the pinned twiddle table, all
    int64 — |X| <= 8000*128*64 so squares stay well inside 64 bits),
    band energy E = sum over bins 1..AUDIO_FFT_BINS of |X_k|^2, one
    bit per adjacent-window energy gradient (Haitsma-Kalker-style
    band-energy differencing, public algorithm). numpy int64 matmul:
    (n_windows x N) sample matrix against the (N x 2*BINS) twiddle
    matrix — vectorized, map-only, linear in samples."""
    import numpy as np

    tre, tim = audio_fft_twiddles()
    mre = np.array(
        [
            [tre[(k * n) % AUDIO_FFT_N] for n in range(AUDIO_FFT_N)]
            for k in range(1, AUDIO_FFT_BINS + 1)
        ],
        dtype=np.int64,
    ).T  # (N, BINS)
    mim = np.array(
        [
            [tim[(k * n) % AUDIO_FFT_N] for n in range(AUDIO_FFT_N)]
            for k in range(1, AUDIO_FFT_BINS + 1)
        ],
        dtype=np.int64,
    ).T

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_wav_samples_np(bytes(p))
                xs = d["samples"].astype(np.int64, copy=False)
                n_win = len(xs) // AUDIO_FFT_HOP - 1
                if n_win < 2:
                    raise ValueError("audio spectral: clip too short")
                idx = (
                    np.arange(n_win)[:, None] * AUDIO_FFT_HOP
                    + np.arange(AUDIO_FFT_N)[None, :]
                )
                s = xs[idx]  # (n_win, N)
                xr = s @ mre
                xi = s @ mim
                e = (xr * xr + xi * xi).sum(axis=1)
                u = 0
                for i in range(min(63, n_win - 1)):
                    if e[i + 1] > e[i]:
                        u |= 1 << i
                if u >= 1 << 63:
                    u -= 1 << 64
                rows.append((int(doc_id), int(n_win), u))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_windows", "sphash"]
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=AUDIO_SPECTRAL_SCHEMA
    )
