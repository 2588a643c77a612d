"""Perceptual dHash unit pins: cross-codec decode equality, raster
PNG round-trip through all five filters, dHash bit math, and the
byte-band LSH recall guarantee (Hamming <= 7 with 8 bands of 8 bits).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from falcon_metrics_etl_spark.functions import multimodal as MM
from falcon_metrics_etl_spark.functions.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _group_raster(g: int, v: int) -> list[list[int]]:
    return [
        [
            MM.dhash_block_value(g, v, x // 8, y // 8)
            for x in range(8 * MM.DHASH_GRID_W)
        ]
        for y in range(8 * MM.DHASH_GRID_H)
    ]


def _dhash_of_pixels(w: int, h: int, px: list[int]) -> int:
    sx, sy = w // MM.DHASH_GRID_W, h // MM.DHASH_GRID_H
    u = 0
    for by in range(MM.DHASH_GRID_H):
        sums = []
        for bx in range(MM.DHASH_GRID_W):
            s = 0
            for y in range(by * sy, (by + 1) * sy):
                base = y * w + bx * sx
                s += sum(px[base : base + sx])
            sums.append(s)
        for bx in range(MM.DHASH_GRID_W - 1):
            if sums[bx + 1] > sums[bx]:
                u |= 1 << (by * 8 + bx)
    return u - (1 << 64) if u >= 1 << 63 else u


def test_png_raster_roundtrip_all_filters():
    """encode_png_gray_raster cycles filters 0-4; decode must recover
    the exact raster (>= 5 rows exercises every filter type)."""
    img = _group_raster(7, 2)
    w, h, ch, px = MM.decode_png_pixels(MM.encode_png_gray_raster(img))
    assert (w, h, ch) == (8 * MM.DHASH_GRID_W, 8 * MM.DHASH_GRID_H, 1)
    assert list(px) == [v for row in img for v in row]


def test_cross_codec_decode_identical():
    """The same blockwise-constant raster shipped as PNG and as
    baseline JPEG decodes to IDENTICAL pixels (the Annex-K-exact
    envelope), hence identical dHash — the property that makes
    cross-codec near-dup pairs exact rather than approximate."""
    for g, v in ((0, 0), (3, 1), (11, 3)):
        img = _group_raster(g, v)
        flat = [val for row in img for val in row]
        w, h, ch, px_png = MM.decode_png_pixels(
            MM.encode_png_gray_raster(img)
        )
        d = decode_jpeg_gray(encode_jpeg_gray(img))
        px_jpeg = [val for row in d["pixels"] for val in row]
        assert list(px_png) == flat
        assert px_jpeg == flat
        assert _dhash_of_pixels(w, h, px_png) == _dhash_of_pixels(
            d["width"], d["height"], px_jpeg
        )


def test_dhash_bit_math_pinned():
    """Hand-checkable 9x8 image (cell = 1 px): row 0 strictly
    increasing -> its 8 bits set; row 1 strictly decreasing -> clear;
    remaining rows constant -> clear (strict >)."""
    w, h = MM.DHASH_GRID_W, MM.DHASH_GRID_H
    px = []
    px += list(range(9))            # row 0: 0..8 increasing
    px += list(range(8, -1, -1))    # row 1: 8..0 decreasing
    px += [5] * (w * (h - 2))       # constant rows
    assert _dhash_of_pixels(w, h, px) == 0xFF


def test_dhash_sign_conversion():
    """An image whose last row is increasing sets bit 63 -> the
    fingerprint must be the NEGATIVE two's-complement long, matching
    the oracle's two-half reconstruction."""
    w, h = MM.DHASH_GRID_W, MM.DHASH_GRID_H
    px = [5] * (w * (h - 1)) + list(range(9))
    got = _dhash_of_pixels(w, h, px)
    assert got == (0xFF << 56) - (1 << 64)
    assert got < 0


def test_band_recall_guarantee():
    """Pigeonhole: two 64-bit hashes within Hamming <= 7 MUST share
    at least one of the 8 byte bands — the LSH recall contract the
    query doc claims. Checked over every 7-bit flip pattern spread
    across distinct bytes plus a same-byte cluster."""
    base = 0x0123456789ABCDEF

    def bands(x):
        return [(x >> (b * 8)) & 255 for b in range(8)]

    # flips concentrated in one byte: 7 other bands untouched
    for flip in (0x7F, 0x3E, 0x01):
        other = base ^ flip
        assert any(
            a == b for a, b in zip(bands(base), bands(other))
        )
    # flips spread over 7 different bytes: the 8th band survives
    spread = base
    for b in range(7):
        spread ^= 1 << (b * 8 + 3)
    assert any(a == b for a, b in zip(bands(base), bands(spread)))
    # 8 flips in 8 different bytes CAN evade banding (why the doc
    # says approximate above Hamming 7)
    evade = base
    for b in range(8):
        evade ^= 1 << (b * 8 + 3)
    assert not any(a == b for a, b in zip(bands(base), bands(evade)))


def test_variant_zero_is_anchor():
    """v=0 never takes the edit branch: the anchor raster equals the
    un-edited md5 draw, and higher variants differ on a sparse block
    set only."""
    g = 5
    anchor = _group_raster(g, 0)
    for v in (1, 2, 3):
        edited = _group_raster(g, v)
        diff_blocks = {
            (x // 8, y // 8)
            for y in range(len(anchor))
            for x in range(len(anchor[0]))
            if anchor[y][x] != edited[y][x]
        }
        n_blocks = MM.DHASH_GRID_W * MM.DHASH_GRID_H
        assert 0 < len(diff_blocks) < n_blocks // 3


def test_media_dhash_rejects_tiny_images(spark):
    """Images below the 9x8 grid raise instead of emitting a
    degenerate fingerprint — driven through the real mapInPandas
    stage."""
    img = [[100] * 4 for _ in range(4)]
    payload = MM.encode_png_gray_raster(img)
    media = spark.createDataFrame(
        [(1, "png", bytearray(payload))],
        "doc_id long, codec string, payload binary",
    )
    with pytest.raises(Exception, match="below the 9x8 grid"):
        MM.media_dhash(media).collect()


# ---------------------------------------------------------------------------
# Video / audio perceptual fingerprints (r10 second wave)
# ---------------------------------------------------------------------------
def _frame_dhash(fkey: str) -> int:
    px = []
    for y in range(8 * MM.DHASH_GRID_H):
        for x in range(8 * MM.DHASH_GRID_W):
            px.append(MM.video_block_value(fkey, x // 8, y // 8))
    return MM.dhash64_of_raster(
        px, 8 * MM.DHASH_GRID_W, 8 * MM.DHASH_GRID_H
    )


def test_video_trim_variant_shares_exact_frames():
    """Variant v of a clip group keeps frames v..5 of the anchor and
    appends v fresh doc-keyed frames: shared distinct frame hashes
    with the anchor must be exactly VIDEO_FRAMES - v."""
    g = 11
    anchors = {MM.video_frame_keys(g * MM.VIDEO_GROUP + 0)[s]
               for s in range(MM.VIDEO_FRAMES)}
    for v in (1, 2):
        keys = MM.video_frame_keys(g * MM.VIDEO_GROUP + v)
        assert len(set(keys) & anchors) == MM.VIDEO_FRAMES - v
        # content keys resolve to distinct hashes (md5-unique blocks)
        hs = {_frame_dhash(k) for k in keys}
        assert len(hs) == MM.VIDEO_FRAMES


def test_y4m_raster_roundtrip_and_frame_dhash():
    """encode_y4m_mono_raster -> decode_y4m_frames recovers the exact
    planes, and the decoded-plane dHash equals the closed-form one."""
    doc_id = 7  # g=2, v=1
    keys = MM.video_frame_keys(doc_id)
    w, h = 8 * MM.DHASH_GRID_W, 8 * MM.DHASH_GRID_H
    planes = []
    for k in keys:
        rows = []
        for by in range(MM.DHASH_GRID_H):
            row = b"".join(
                bytes([MM.video_block_value(k, bx, by)]) * 8
                for bx in range(MM.DHASH_GRID_W)
            )
            rows.extend([row] * 8)
        planes.append(b"".join(rows))
    d = MM.decode_y4m_frames(MM.encode_y4m_mono_raster(w, h, planes))
    assert d["n_frames"] == MM.VIDEO_FRAMES
    assert [bytes(f) for f in d["frames"]] == planes
    for k, plane in zip(keys, d["frames"]):
        assert MM.dhash64_of_raster(plane, w, h) == _frame_dhash(k)


def test_audio_pcm16_roundtrip_and_energy_bits():
    """encode_wav_pcm16 -> decode_wav_samples is bit-exact on signed
    amplitudes, and a handcrafted energy staircase pins the gradient
    bit math (strictly rising |amp| -> all bits set)."""
    amps = [100 * (s + 1) * (-1 if s % 2 else 1)
            for s in range(MM.AUDIO_SEGMENTS)]
    samples = []
    for a in amps:
        samples.extend([a] * MM.AUDIO_SEG_LEN)
    d = MM.decode_wav_samples(MM.encode_wav_pcm16(samples))
    assert list(d["samples"]) == samples
    energies = [
        sum(abs(x) for x in samples[w * 64 : (w + 1) * 64])
        for w in range(MM.AUDIO_SEGMENTS)
    ]
    assert all(b > a for a, b in zip(energies, energies[1:]))
    # the all-rising staircase sets every one of the 64 bits -> -1
    u = 0
    for i in range(MM.AUDIO_SEGMENTS - 1):
        u |= 1 << i
    assert u - (1 << 64) == -1


def test_audio_variant_edits_are_sparse():
    g = 9
    anchor = [MM.audio_segment_value(g, 0, s)
              for s in range(MM.AUDIO_SEGMENTS)]
    for v in (1, 2, 3):
        edited = [MM.audio_segment_value(g, v, s)
                  for s in range(MM.AUDIO_SEGMENTS)]
        diffs = sum(1 for a, b in zip(anchor, edited) if a != b)
        assert 0 < diffs < MM.AUDIO_SEGMENTS // 3


def test_aligned_run_discriminates_reorder_from_trim(spark):
    """video_near_dup_aligned's core claim: a TRIMMED copy aligns its
    whole shared-frame set in one consecutive run, while a REORDERED
    re-cut of the same frames fragments it."""
    from falcon_metrics_etl_spark.plans.media_dedup import (
        aligned_video_pairs,
    )

    w = 8 * MM.DHASH_GRID_W
    h = 8 * MM.DHASH_GRID_H

    def plane(key):
        rows = []
        for by in range(MM.DHASH_GRID_H):
            row = b"".join(
                bytes([MM.video_block_value(key, bx, by)]) * 8
                for bx in range(MM.DHASH_GRID_W)
            )
            rows.extend([row] * 8)
        return b"".join(rows)

    base = [plane(f"T:{i}") for i in range(6)]
    trimmed = base[1:] + [plane("T:fresh")]          # doc 1: trim+extend
    reordered = [base[i] for i in (3, 0, 4, 1, 5, 2)]  # doc 2: re-cut
    clips = [(0, base), (1, trimmed), (2, reordered)]
    media = spark.createDataFrame(
        [
            (d, MM.encode_y4m_mono_raster(w, h, frames))
            for d, frames in clips
        ],
        "doc_id long, payload binary",
    )
    fp = MM.video_frame_dhash(media)
    rows = {
        (r["id_a"], r["id_b"]): (r["n_shared_frames"], r["aligned_run"])
        for r in aligned_video_pairs(fp).collect()
    }
    # trim pair: 5 shared frames, all in one aligned run
    assert rows[(0, 1)] == (5, 5)
    # reorder pair: all 6 frames shared, but no two stay consecutive
    # under the chosen permutation -> aligned_run collapses to 1
    assert rows[(0, 2)][0] == 6
    assert rows[(0, 2)][1] == 1
    # the distinct-frame count alone could NOT tell these apart
    assert rows[(0, 2)][0] >= rows[(0, 1)][0]


def test_spectral_dhash_is_a_real_dft(spark):
    """The spectral fingerprint must come from the actual per-sample
    transform, not the oracle's constant-halves shortcut: feed a RAMP
    signal (no two samples equal inside a window) and check the
    engine against an independent pure-Python DFT over the same
    pinned twiddle table."""
    tre, tim = MM.audio_fft_twiddles()
    n_seg = 6  # 384 samples -> 5 windows -> 4 gradient bits
    samples = [((7 * i) % 16001) - 8000 for i in range(64 * n_seg)]
    media = spark.createDataFrame(
        [(0, MM.encode_wav_pcm16(samples))], "doc_id long, payload binary"
    )
    row = MM.audio_spectral_dhash(media).collect()[0]
    n_win = len(samples) // MM.AUDIO_FFT_HOP - 1
    assert row["n_windows"] == n_win == 5

    def energy(w):
        e = 0
        xs = samples[w * 64 : w * 64 + 128]
        for k in range(1, MM.AUDIO_FFT_BINS + 1):
            re = sum(x * tre[(k * n) % 128] for n, x in enumerate(xs))
            im = sum(x * tim[(k * n) % 128] for n, x in enumerate(xs))
            e += re * re + im * im
        return e

    es = [energy(w) for w in range(n_win)]
    u = 0
    for i in range(n_win - 1):
        if es[i + 1] > es[i]:
            u |= 1 << i
    if u >= 1 << 63:
        u -= 1 << 64
    assert row["sphash"] == u


def test_spectral_halfsum_linearity():
    """audio_fft_halfsums must equal the per-sample DFT of a
    constant-halves window — the identity the oracle rides on."""
    tre, tim = MM.audio_fft_twiddles()
    a, b = 1234, -567
    xs = [a] * 64 + [b] * 64
    for k, (pr, pi, qr, qi) in enumerate(MM.audio_fft_halfsums(), 1):
        re = sum(x * tre[(k * n) % 128] for n, x in enumerate(xs))
        im = sum(x * tim[(k * n) % 128] for n, x in enumerate(xs))
        assert re == a * pr + b * qr
        assert im == a * pi + b * qi


def test_video_keep_best_prefers_longest_clip(spark):
    """video_dedup_keep_best's quality rule on variable-length clips
    (the corpus fixture's clips are all the same length, exercising
    only the tiebreak): the 8-frame original must win over its
    5-frame trimmed copy regardless of id order."""
    from falcon_metrics_etl_spark.plans.media_dedup import (
        video_keep_best_of,
    )

    w = 8 * MM.DHASH_GRID_W
    h = 8 * MM.DHASH_GRID_H

    def plane(key):
        rows = []
        for by in range(MM.DHASH_GRID_H):
            row = b"".join(
                bytes([MM.video_block_value(key, bx, by)]) * 8
                for bx in range(MM.DHASH_GRID_W)
            )
            rows.extend([row] * 8)
        return b"".join(rows)

    base = [plane(f"K:{i}") for i in range(8)]
    clips = [
        (0, base[:5]),   # trimmed copy, SMALLER id
        (1, base),       # the 8-frame original
        (2, [plane("K:solo")]),  # unclustered singleton
    ]
    media = spark.createDataFrame(
        [
            (d, MM.encode_y4m_mono_raster(w, h, frames))
            for d, frames in clips
        ],
        "doc_id long, payload binary",
    )
    rows = {
        r["doc_id"]: (r["n_frames"], r["keep_id"], r["status"])
        for r in video_keep_best_of(
            MM.video_frame_dhash(media)
        ).collect()
    }
    # min-id would keep doc 0; the frame-count rule keeps doc 1
    assert rows[0] == (5, 1, "dropped")
    assert rows[1] == (8, 1, "kept")
    assert rows[2] == (1, 2, "kept")


def test_audio_keep_best_prefers_longest_recording(spark):
    """audio_dedup_keep_best's rule on variable-length clips: the
    longer original must win over its clipped copy at a smaller id."""
    from falcon_metrics_etl_spark.plans.media_dedup import (
        audio_keep_best_of,
    )

    segs = [MM.audio_segment_value(900, 0, s) for s in range(20)]

    def pcm(seg_vals):
        return [v for sv in seg_vals for v in [sv] * MM.AUDIO_SEG_LEN]

    # the unrelated clip is LONG (64 segments): a short clip's hash is
    # mostly zero bits, and all-zero high bands collide in the banded
    # index for every short clip — a real LSH degeneracy of padded
    # items; the Hamming verification must then separate it, which
    # needs enough meaningful bits
    clips = [
        (0, pcm(segs[:12])),  # clipped copy, SMALLER id
        (1, pcm(segs)),       # the 20-segment original
        (2, pcm([MM.audio_segment_value(901, 0, s) for s in range(64)])),
    ]
    media = spark.createDataFrame(
        [(d, MM.encode_wav_pcm16(xs)) for d, xs in clips],
        "doc_id long, payload binary",
    )
    fp = MM.audio_energy_dhash(media).select("doc_id", "n_samples", "ahash")
    rows = {
        r["doc_id"]: (r["n_samples"], r["keep_id"], r["status"])
        for r in audio_keep_best_of(fp).collect()
    }
    # clips 0 and 1 share the first 11 gradient bits; the clipped
    # copy's hash agrees on the low bits -> banded pair -> clustered
    assert rows[1] == (20 * MM.AUDIO_SEG_LEN, 1, "kept")
    assert rows[0][1:] == (1, "dropped")
    assert rows[2][2] == "kept"  # 63 meaningful bits -> Hamming > T


def test_keyframe_thumbnail_matches_its_clip_frame(spark):
    """Cross-modal fixture contract (r12): a thumbnail doc's PNG
    decodes to a dHash IDENTICAL to its own clip's exported frame
    fingerprint — through two entirely different codec paths (PNG
    unfilter vs Y4M frame walk)."""
    from falcon_metrics_etl_spark.functions import multimodal as MM

    ids = spark.createDataFrame(
        [(i,) for i in range(22)], "doc_id long"
    )
    thumbs = {
        r["doc_id"]: r["dhash"]
        for r in MM.media_dhash(
            MM.attach_payload_keyframe_thumbs(ids)
        ).collect()
    }
    assert set(thumbs) == {i for i in range(22) if i % MM.CM_THUMB_MOD == 0}
    frames = {
        (r["doc_id"], r["frame_idx"]): r["frame_dhash"]
        for r in MM.video_frame_dhash(
            MM.attach_payload_video_clips(ids)
        ).collect()
    }
    for d, h in thumbs.items():
        assert h == frames[(d, MM.thumb_slot(d))]


def test_cross_modal_pairs_and_mixed_keep_best(spark, sf_smoke):
    """cross_modal_near_dup finds every planted thumbnail against its
    own clip (exact surface => Hamming 0) and cross_modal_keep_best
    always keeps the footage over its exported still."""
    from falcon_metrics_etl_spark.functions import multimodal as MM
    from falcon_metrics_etl_spark.plans.media_dedup import (
        cross_modal_keep_best,
        cross_modal_near_dup,
    )
    from falcon_metrics_etl_spark.sources import load_table

    n_docs = load_table(spark, sf_smoke, "documents").count()
    pairs = cross_modal_near_dup(spark, sf_smoke).collect()
    own = {
        (r["img_id"], r["clip_id"]): r
        for r in pairs
        if r["img_kind"] == "thumb" and r["img_id"] == r["clip_id"]
    }
    thumb_ids = {i for i in range(n_docs) if i % MM.CM_THUMB_MOD == 0}
    assert {a for a, _ in own} == thumb_ids
    for r in own.values():
        assert r["min_hamming"] == 0 and r["n_frames_matched"] >= 1

    kb = cross_modal_keep_best(spark, sf_smoke).collect()
    by_node = {(r["doc_id"], r["modality"]): r for r in kb}
    for t in thumb_ids:
        row = by_node[(t, "image")]
        # a still can never beat footage: its keeper is a clip
        assert row["status"] == "dropped"
        assert row["keep_modality"] == "video"
        # and its own clip is in the keeper's cluster
        assert by_node[(t, "video")]["keep_doc"] == row["keep_doc"]


def test_soundtrack_rip_matches_its_recording(spark):
    """Cross-modal audio fixture contract (r13): a track doc's
    re-containerized WAV decodes to a spectral fingerprint IDENTICAL
    to its own recording's — the files differ (LIST/INFO chunk), the
    streams don't."""
    from falcon_metrics_etl_spark.functions import multimodal as MM

    ids = spark.createDataFrame(
        [(i,) for i in range(28)], "doc_id long"
    )
    track_rows = MM.attach_payload_soundtrack_wavs(ids).collect()
    rec_rows = {
        r["doc_id"]: r["payload"]
        for r in MM.attach_payload_audio_clips(ids).collect()
    }
    assert {r["doc_id"] for r in track_rows} == {
        i for i in range(28) if i % MM.CM_TRACK_MOD == 0
    }
    for r in track_rows:
        # real container difference, identical decoded stream
        assert bytes(r["payload"]) != bytes(rec_rows[r["doc_id"]])
    tr_fp = {
        r["doc_id"]: r["sphash"]
        for r in MM.audio_spectral_dhash(
            MM.attach_payload_soundtrack_wavs(ids)
        ).collect()
    }
    rec_fp = {
        r["doc_id"]: r["sphash"]
        for r in MM.audio_spectral_dhash(
            MM.attach_payload_audio_clips(ids)
        ).collect()
    }
    for d, h in tr_fp.items():
        assert h == rec_fp[d]


def test_cross_modal_audio_pairs_and_trimodal_keep_best(spark, sf_smoke):
    """cross_modal_audio_near_dup finds every planted soundtrack rip
    against its own recording (identical stream => Hamming 0), and the
    trimodal keep-best keeps footage over BOTH exported artifacts: the
    recording that matches a clip's rip is dropped in favor of the
    clip."""
    from falcon_metrics_etl_spark.functions import multimodal as MM
    from falcon_metrics_etl_spark.plans.media_dedup import (
        cross_modal_audio_near_dup,
        cross_modal_keep_best_trimodal,
    )
    from falcon_metrics_etl_spark.sources import load_table

    n_docs = load_table(spark, sf_smoke, "documents").count()
    track_ids = {i for i in range(n_docs) if i % MM.CM_TRACK_MOD == 0}
    pairs = cross_modal_audio_near_dup(spark, sf_smoke).collect()
    own = {r["rec_id"]: r for r in pairs if r["rec_id"] == r["clip_id"]}
    assert set(own) == track_ids
    for r in own.values():
        assert r["hamming"] == 0

    kb = cross_modal_keep_best_trimodal(spark, sf_smoke).collect()
    by_node = {(r["doc_id"], r["modality"]): r for r in kb}
    for t in track_ids:
        row = by_node[(t, "audio")]
        # a rip-matched recording can never beat footage
        assert row["status"] == "dropped"
        assert row["keep_modality"] == "video"
        assert by_node[(t, "video")]["keep_doc"] == row["keep_doc"]
    # thumbnails keep losing to footage in the trimodal closure too
    for t in {i for i in range(n_docs) if i % MM.CM_THUMB_MOD == 0}:
        assert by_node[(t, "image")]["status"] == "dropped"
        assert by_node[(t, "image")]["keep_modality"] == "video"


def test_audio_spectral_band_pigeonhole_and_wide_layout(spark):
    """The audio spectral index's band-width contract (r14): 8x8-bit
    banding GUARANTEES a shared band for pairs at Hamming <= 7
    (pigeonhole), the widened 4x16-bit layout guarantees <= 3, and
    AUDIO_SPECTRAL_T > 7 means banding is part of the audio edge
    DEFINITION (a pair at Hamming 8..14 sharing no band is not an
    edge) — the same contract the image family documents. Also pins
    the subset property on sphash-named frames: the wide layout never
    invents candidate pairs."""
    import random as _random

    from pyspark.sql import functions as F

    from falcon_metrics_etl_spark.plans.media_dedup import (
        AUDIO_SPECTRAL_T,
        image_bands_of,
    )

    # documented: threshold exceeds the pigeonhole bound, so banding
    # participates in the edge definition
    assert AUDIO_SPECTRAL_T > 7

    rng = _random.Random(14)

    def bands(x, nb):
        bits = 64 // nb
        return [(x >> (b * bits)) & ((1 << bits) - 1) for b in range(nb)]

    for _ in range(200):
        base = rng.getrandbits(63)
        # any <= 7 flipped bits leave some 8-bit band untouched
        k = rng.randrange(1, 8)
        other = base
        for pos in rng.sample(range(64), k):
            other ^= 1 << pos
        assert any(a == b for a, b in zip(bands(base, 8), bands(other, 8)))
        # any <= 3 flipped bits leave some 16-bit band untouched
        k = rng.randrange(1, 4)
        other = base
        for pos in rng.sample(range(64), k):
            other ^= 1 << pos
        assert any(a == b for a, b in zip(bands(base, 4), bands(other, 4)))

    # 8 flips, one per 8-bit band, CAN evade the 8x8 layout — the
    # bound is tight
    base = 0x5A5A3C3CF0F01E1E
    evade = base
    for b in range(8):
        evade ^= 1 << (b * 8 + 2)
    assert not any(a == b for a, b in zip(bands(base, 8), bands(evade, 8)))

    fp = spark.createDataFrame(
        [(1, base), (2, base ^ 0x7), (3, evade)],
        "doc_id long, sphash long",
    )

    def pairs(nb):
        b = image_bands_of(fp, "sphash", n_bands=nb)
        return {
            (r["a"], r["b"])
            for r in b.alias("x")
            .join(
                b.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.byte") == F.col("y.byte"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
            )
            .distinct()
            .collect()
        }

    assert pairs(4) <= pairs(8)
    assert (1, 2) in pairs(8)  # Hamming 3: both layouts must see it
    assert (1, 2) in pairs(4)


def test_wide_band_recall_guarantee_and_subset(spark):
    """The 4x16-bit layout (r13 knob): pigeonhole guarantees a shared
    band for Hamming <= 3; and on a real fingerprint frame the wide
    layout's candidate set is a SUBSET of the 8x8 one restricted to
    pairs it can still see (fewer, wider bands never invent pairs)."""
    from pyspark.sql import functions as F

    from falcon_metrics_etl_spark.plans.media_dedup import (
        image_bands_of,
    )

    base = 0x0123456789ABCDEF

    def wide(x):
        return [(x >> (b * 16)) & 0xFFFF for b in range(4)]

    for flips in ((0x7,), (0x1, 0x10000), (1 << 5, 1 << 21, 1 << 37)):
        other = base
        for f in flips:
            other ^= f
        assert any(a == b for a, b in zip(wide(base), wide(other)))
    # 4 flips in 4 different 16-bit bands CAN evade the wide layout
    evade = base
    for b in range(4):
        evade ^= 1 << (b * 16 + 3)
    assert not any(a == b for a, b in zip(wide(base), wide(evade)))

    fp = spark.createDataFrame(
        [(1, base), (2, base ^ 0x7), (3, base ^ evade ^ base)],
        "doc_id long, dhash long",
    )

    def pairs(nb):
        b = image_bands_of(fp, "dhash", n_bands=nb)
        return {
            (r["a"], r["b"])
            for r in b.alias("x")
            .join(
                b.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.byte") == F.col("y.byte"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
            )
            .distinct()
            .collect()
        }

    assert pairs(4) <= pairs(8)
    assert (1, 2) in pairs(4)  # Hamming 3: guaranteed in both layouts
