"""Multimodal queries: binary-payload metadata decode (mapInPandas)
and video frame sampling — the training-data-pipeline operations over
opaque media columns.

The decode itself happens in Arrow-batched Python (the only Python in
this engine's hot paths besides the W2 event-date extractor). PNG,
JPEG (baseline gray + 4:4:4 color), WAV (PCM, float, G.711, both
ADPCM families) and Y4M queries run REAL codecs end to end; the
deterministic synthetic codec covers only the perceptual formats
that need external libraries (mp3/h264). In every case the DuckDB
oracle replays the decode arithmetic exactly, so the correctness
gate covers the full binary->Arrow->pandas->schema round trip, not
a mock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions import multimodal as MM
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.sources import load_table

FRAME_EVERY_K = 50

# DuckDB replay of _decode_one's md5 header arithmetic (payload bytes
# == utf-8 text, so md5(payload) == md5(text))
_DUCK_META = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       'synthetic' AS codec,
       strlen(text)::BIGINT AS n_bytes,
       CASE WHEN doc_id % 3 IN (0, 2)
            THEN (('0x' || substring(md5(text), 1, 4))::INT % 1024) + 1
            ELSE 0 END AS width,
       CASE WHEN doc_id % 3 IN (0, 2)
            THEN (('0x' || substring(md5(text), 5, 4))::INT % 1024) + 1
            ELSE 0 END AS height,
       CASE WHEN doc_id % 3 IN (1, 2)
            THEN (('0x' || substring(md5(text), 9, 4))::INT % 60000) + 1
            ELSE 0 END AS duration_ms,
       CASE doc_id % 3
            WHEN 2 THEN ((('0x' || substring(md5(text), 9, 4))::INT % 60000) + 1) // 40
            WHEN 0 THEN 1 ELSE 0 END AS n_frames
FROM documents
"""


@register(
    "multimodal_decode_meta",
    doc="Multimodal metadata decode: opaque binary payload + declared "
    "codec -> typed (width, height, duration, frames) via Arrow-batched "
    "mapInPandas; deterministic synthetic codec, real decoders stubbed "
    "(functions/multimodal.py). Map-only — no shuffle; metadata-only "
    "readers never touch the bytes column (parquet column pruning).",
    tags=("multimodal", "pandas-udf", "binary"),
    oracle=_DUCK_META,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload(docs)
    return MM.decode_media_meta(media)


@register(
    "multimodal_frame_sample",
    doc=f"Video frame sampling: every {FRAME_EVERY_K}th frame index per "
    "video document, exploded to one row per sampled frame — the fan-out "
    "shape a frame-extraction stage feeds; the index list is a JVM-side "
    "sequence() so only the downstream decode would run in Python.",
    tags=("multimodal", "explode", "array"),
    oracle=f"""
WITH meta AS ({_DUCK_META})
SELECT doc_id, unnest(range(0, n_frames, {FRAME_EVERY_K}))::INT AS frame_idx
FROM meta WHERE media_type = 'video' AND n_frames > 0
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = multimodal_decode_meta(spark, sf_dir)
    vids = meta.filter(
        (F.col("media_type") == "video") & (F.col("n_frames") > 0)
    )
    return vids.select(
        "doc_id",
        F.explode(
            MM.sample_frame_indices(F.col("n_frames"), FRAME_EVERY_K)
        ).alias("frame_idx"),
    )


RESIZE_BOX = 256


@register(
    "multimodal_resize_dims",
    doc=f"Resize planning: fit every image/video inside a "
    f"{RESIZE_BOX}px box preserving aspect ratio — decode metadata in "
    "Arrow-batched Python, then pure JVM integer arithmetic for the "
    "target dims (the pixel resample is stubbed with the codecs; the "
    "stage sizing math is engine-side and exact)",
    tags=("multimodal", "expression"),
    oracle=f"""
WITH meta AS ({_DUCK_META})
SELECT doc_id, width, height,
       GREATEST(1, (width * {RESIZE_BOX}) // GREATEST(width, height))::INT AS target_w,
       GREATEST(1, (height * {RESIZE_BOX}) // GREATEST(width, height))::INT AS target_h
FROM meta
WHERE media_type IN ('image', 'video') AND width > 0
""",
)
def multimodal_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = multimodal_decode_meta(spark, sf_dir).filter(
        F.col("media_type").isin("image", "video") & (F.col("width") > 0)
    )
    t = MM.resize_dims(F.col("width"), F.col("height"), RESIZE_BOX)
    return meta.select(
        "doc_id", "width", "height",
        t.target_w.alias("target_w"), t.target_h.alias("target_h"),
    )


@register(
    "multimodal_feature_stub",
    doc="Feature extraction stub: opaque payload -> 8-dim synthetic "
    "embedding (md5-nibble fractions, exact in double) via Arrow-batched "
    "mapInPandas, emitted in long (doc_id, dim_idx, feature) form — the "
    "binary->embedding bridge that feeds the vector/ANN layer; the real "
    "model forward pass swaps in where the codec stub sits",
    tags=("multimodal", "pandas-udf", "vector"),
    oracle="""
SELECT doc_id,
       CAST(k AS INT) AS dim_idx,
       (('0x' || substring(md5(text), 4 * k + 1, 4))::INT / 65536.0) AS feature
FROM documents, unnest(range(0, 8)) AS t(k)
""",
)
def multimodal_feature_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload(docs)
    return MM.extract_feature_stub(media)


@register(
    "multimodal_decode_png",
    doc="REAL codec path: spec-valid grayscale PNGs (signature + IHDR + "
    "CRC-checked, level-0 IDAT) built per document, then decoded by the "
    "genuine header parser in decode_media_meta (codec='png' branch, "
    "functions/multimodal.py) — the non-stub proof that the binary->"
    "Arrow->decode plumbing runs an actual format end-to-end. The "
    "level-0 IDAT makes the byte size the closed form h*(w+1)+68, so "
    "the oracle replays every output column including n_bytes.",
    tags=("multimodal", "pandas-udf", "binary", "codec"),
    oracle="""
SELECT doc_id, 'image' AS media_type, 'png' AS codec,
       CAST(h * (w + 1) + 68 AS BIGINT) AS n_bytes,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       0 AS duration_ms, 1 AS n_frames
FROM (
    SELECT doc_id,
           ('0x' || substring(md5(text), 1, 4))::INT % 16 + 1 AS w,
           ('0x' || substring(md5(text), 5, 4))::INT % 16 + 1 AS h
    FROM documents
) dims
""",
)
def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_png(docs)
    return MM.decode_media_meta(media)


@register(
    "multimodal_decode_wav",
    doc="Second REAL codec path (audio): PCM WAVs (RIFF/WAVE/fmt/data, "
    "chunk-walk parser that tolerates interleaved LIST/fact chunks) "
    "built per document and decoded by the codec='wav' branch of "
    "decode_media_meta. 8 kHz mono 8-bit => n_bytes = 44 + 8*duration_ms "
    "and the decoded duration round-trips exactly, so every column "
    "oracles in closed form.",
    tags=("multimodal", "pandas-udf", "binary", "codec"),
    oracle="""
SELECT doc_id, 'audio' AS media_type, 'wav' AS codec,
       CAST(44 + 8 * dur AS BIGINT) AS n_bytes,
       0 AS width, 0 AS height,
       CAST(dur AS INT) AS duration_ms, 0 AS n_frames
FROM (
    SELECT doc_id,
           ('0x' || substring(md5(text), 9, 4))::INT % 2000 + 1 AS dur
    FROM documents
) durs
""",
)
def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_wav(docs)
    return MM.decode_media_meta(media)


# DuckDB twin of the gradient-PNG dims/base derivation
_DUCK_GRAD_DIMS = """
SELECT doc_id,
       ('0x' || substring(md5(text), 1, 4))::INT % 16 + 1 AS w,
       ('0x' || substring(md5(text), 5, 4))::INT % 16 + 1 AS h,
       ('0x' || substring(md5(text), 9, 2))::INT % 200 AS b
FROM documents
"""


@register(
    "multimodal_png_pixel_stats",
    doc="REAL pixel decode: gradient grayscale PNGs (pixel = base+x+y, "
    "row filters mixed None/Up, real deflate IDAT) decoded by "
    "decode_png_pixels (stdlib zlib inflate + scanline unfiltering, "
    "all five PNG filters) and aggregated per image. The oracle "
    "replays the closed-form raster stats — matching them is only "
    "possible by actually unfiltering the bytes. Map-only, no shuffle.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "pixels"),
    oracle=f"""
WITH dims AS ({_DUCK_GRAD_DIMS})
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(b AS INT) AS min_pixel,
       CAST(b + w + h - 2 AS INT) AS max_pixel,
       CAST(w*h*b + h*(w*(w-1))//2 + w*(h*(h-1))//2 AS BIGINT) AS sum_pixel,
       CAST(w*h*b + h*(w*(w-1))//2 + w*(h*(h-1))//2 AS DOUBLE)
           / (w * h) AS mean_pixel
FROM dims
""",
)
def multimodal_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_png_gradient(docs)
    return MM.png_pixel_stats(media)


@register(
    "multimodal_png_color_pixel_stats",
    doc="REAL color decode over EVERY supported 8-bit color type "
    "(2/3/6/4 by doc_id % 4): truecolor RGB gradients (R=b+x+y, "
    "G=b+2x, B=b+2y; rows cycle ALL five PNG filters at bpp=3), "
    "palette images (PLTE entry i=(i,2i,3i), index=(x+y)%16), RGBA "
    "(the RGB gradient + alpha=b+3x, filters cycled at bpp=4) and "
    "gray+alpha (gray=b+x+y, alpha=b+2y, bpp=2). decode_png_pixels "
    "unfilters bpp-aware, PLTE-expands, and returns alpha interleaved; "
    "the oracle replays the closed-form channel statistics (per-doc "
    "range unnest for the palette index sums) — matching is only "
    "possible by genuinely unfiltering multi-byte pixels. Map-only.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "pixels"),
    oracle=f"""
WITH dims AS ({_DUCK_GRAD_DIMS}),
rgb AS (
    SELECT doc_id, 2 AS color_type, 3 AS channels, w, h,
           3 * w * h AS n_values,
           b AS min_value,
           b + GREATEST(w + h - 2, 2 * (w - 1), 2 * (h - 1)) AS max_value,
           3*w*h*b + 3*h*(w*(w-1))//2 + 3*w*(h*(h-1))//2 AS sum_values
    FROM dims WHERE doc_id % 4 = 0
),
pal_xy AS (
    SELECT doc_id, x, unnest(range(0, h)) AS y
    FROM (SELECT doc_id, h, unnest(range(0, w)) AS x
          FROM dims WHERE doc_id % 4 = 1)
),
pal_idx AS (
    SELECT doc_id, SUM((x + y) % 16) AS sidx FROM pal_xy GROUP BY doc_id
),
pal AS (
    SELECT d.doc_id, 3 AS color_type, 3 AS channels, w, h,
           3 * w * h AS n_values,
           0 AS min_value,
           3 * LEAST(15, w + h - 2) AS max_value,
           6 * p.sidx AS sum_values
    FROM dims d JOIN pal_idx p ON p.doc_id = d.doc_id
),
rgba AS (
    SELECT doc_id, 6 AS color_type, 4 AS channels, w, h,
           4 * w * h AS n_values,
           b AS min_value,
           b + GREATEST(w + h - 2, 3 * (w - 1), 2 * (h - 1)) AS max_value,
           4*w*h*b + 6*(h*(w*(w-1))//2) + 3*(w*(h*(h-1))//2) AS sum_values
    FROM dims WHERE doc_id % 4 = 2
),
ga AS (
    SELECT doc_id, 4 AS color_type, 2 AS channels, w, h,
           2 * w * h AS n_values,
           b AS min_value,
           b + GREATEST(w + h - 2, 2 * (h - 1)) AS max_value,
           2*w*h*b + h*(w*(w-1))//2 + 3*(w*(h*(h-1))//2) AS sum_values
    FROM dims WHERE doc_id % 4 = 3
)
SELECT doc_id, color_type, channels,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(n_values AS BIGINT) AS n_values,
       CAST(min_value AS INT) AS min_value,
       CAST(max_value AS INT) AS max_value,
       CAST(sum_values AS BIGINT) AS sum_values,
       CAST(sum_values AS DOUBLE) / n_values AS mean_value
FROM (SELECT * FROM rgb UNION ALL SELECT * FROM pal
      UNION ALL SELECT * FROM rgba UNION ALL SELECT * FROM ga)
""",
)
def multimodal_png_color_pixel_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_png_color(docs)
    return MM.png_color_pixel_stats(media)


@register(
    "multimodal_png_depth16_interlace_stats",
    doc="REAL decode across EVERY remaining PNG structure variant "
    "(doc_id % 4): 16-BIT grayscale gradients (sample = 256b+300x+77y "
    "big-endian, rows cycle all five filters at the 2-byte stride); "
    "Adam7-INTERLACED 8-bit gradients (7 independently filtered "
    "passes); SUB-BYTE grayscale ((x+y) % 2^d at depth 1/2/4 — packed "
    "MSB-first, per-scanline bit padding, filtered at the 1-byte "
    "stride); SUB-BYTE palette (same indices through a PLTE). "
    "decode_png_pixels deinterlaces, unpacks 16-bit samples and "
    "unpacks packed bits; the oracle replays all four closed forms "
    "(range-unnest modular sums for the sub-byte grids). NOTHING in "
    "PNG is stubbed any more. Map-only.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "pixels"),
    oracle=f"""
WITH dims AS (
SELECT doc_id,
       ('0x' || substring(md5(text), 1, 4))::INT % 16 + 1 AS w,
       ('0x' || substring(md5(text), 5, 4))::INT % 16 + 1 AS h,
       ('0x' || substring(md5(text), 9, 2))::INT % 200 AS b,
       CASE ('0x' || substring(md5(text), 11, 2))::INT % 3
            WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 16 END AS md
FROM documents
),
g16 AS (
    SELECT doc_id, w, h, 1 AS chans,
           256*b AS min_v,
           256*b + 300*(w-1) + 77*(h-1) AS max_v,
           256*b*w*h + 300*h*(w*(w-1))//2 + 77*w*(h*(h-1))//2 AS sum_v
    FROM dims WHERE doc_id % 4 = 0
),
g8i AS (
    SELECT doc_id, w, h, 1 AS chans,
           b AS min_v,
           b + w + h - 2 AS max_v,
           w*h*b + h*(w*(w-1))//2 + w*(h*(h-1))//2 AS sum_v
    FROM dims WHERE doc_id % 4 = 1
),
sub_xy AS (
    SELECT doc_id, md, x, unnest(range(0, h)) AS y
    FROM (SELECT doc_id, h, md, unnest(range(0, w)) AS x
          FROM dims WHERE doc_id % 4 IN (2, 3))
),
sub_sum AS (
    SELECT doc_id, SUM((x + y) % md) AS sidx FROM sub_xy GROUP BY doc_id
),
gsub AS (
    SELECT d.doc_id, w, h, 1 AS chans,
           0 AS min_v,
           LEAST(md - 1, w + h - 2) AS max_v,
           p.sidx AS sum_v
    FROM dims d JOIN sub_sum p ON p.doc_id = d.doc_id
    WHERE d.doc_id % 4 = 2
),
psub AS (
    SELECT d.doc_id, w, h, 3 AS chans,
           0 AS min_v,
           3 * LEAST(md - 1, w + h - 2) AS max_v,
           6 * p.sidx AS sum_v
    FROM dims d JOIN sub_sum p ON p.doc_id = d.doc_id
    WHERE d.doc_id % 4 = 3
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h * chans AS BIGINT) AS n_pixels,
       CAST(min_v AS INT) AS min_pixel,
       CAST(max_v AS INT) AS max_pixel,
       CAST(sum_v AS BIGINT) AS sum_pixel,
       CAST(sum_v AS DOUBLE) / (w * h * chans) AS mean_pixel
FROM (SELECT * FROM g16 UNION ALL SELECT * FROM g8i
      UNION ALL SELECT * FROM gsub UNION ALL SELECT * FROM psub)
""",
)
def multimodal_png_depth16_interlace_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_png_depth_variants(docs)
    return MM.png_pixel_stats(media)


RESAMPLE_BOX = 8


@register(
    "multimodal_png_resample",
    doc=f"REAL pixel resample: decode the gradient PNGs, "
    f"nearest-neighbour fit into a {RESAMPLE_BOX}px box with the "
    "integer floor mapping src = dst*size//target (resample_nearest), "
    "aggregate the RESAMPLED raster. The oracle recomputes the sampled "
    "index sums with the same integer arithmetic (per-row range "
    "unnest) — header math alone cannot produce these values.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "pixels"),
    oracle=f"""
WITH dims AS ({_DUCK_GRAD_DIMS}),
t AS (
    SELECT doc_id, w, h, b,
           GREATEST(1, (w * {RESAMPLE_BOX}) // GREATEST(w, h)) AS tw,
           GREATEST(1, (h * {RESAMPLE_BOX}) // GREATEST(w, h)) AS th
    FROM dims
),
sx AS (
    SELECT doc_id, SUM((i * w) // tw) AS s_x
    FROM (SELECT doc_id, w, tw, unnest(range(0, tw)) AS i FROM t)
    GROUP BY doc_id
),
sy AS (
    SELECT doc_id, SUM((j * h) // th) AS s_y
    FROM (SELECT doc_id, h, th, unnest(range(0, th)) AS j FROM t)
    GROUP BY doc_id
)
SELECT t.doc_id, CAST(tw AS INT) AS width, CAST(th AS INT) AS height,
       CAST(tw * th AS BIGINT) AS n_pixels,
       CAST(b AS INT) AS min_pixel,
       CAST(b + ((tw-1)*w)//tw + ((th-1)*h)//th AS INT) AS max_pixel,
       CAST(tw*th*b + th*s_x + tw*s_y AS BIGINT) AS sum_pixel,
       CAST(tw*th*b + th*s_x + tw*s_y AS DOUBLE) / (tw * th) AS mean_pixel
FROM t JOIN sx ON sx.doc_id = t.doc_id JOIN sy ON sy.doc_id = t.doc_id
""",
)
def multimodal_png_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_png_gradient(docs)
    return MM.png_pixel_stats(media, box=RESAMPLE_BOX)


@register(
    "multimodal_wav_sample_stats",
    doc="REAL PCM sample decode: square-wave WAVs (samples alternate "
    "base, base+1) decoded by decode_wav_samples (chunk walk + sample "
    "unpack; PCM 8/16-bit mono) and aggregated; duration re-derived "
    "from the decoded sample count, not the header. Oracle replays the "
    "closed-form sample stats. Remaining codec stubs after r7: "
    "mp3-in-wav, compressed video (h264) — perceptual codec-lib "
    "territory; PNG, PCM/float WAV, IMA-ADPCM (mono+stereo), "
    "MS-ADPCM, G.711 A-law/mu-law and baseline JPEG decode "
    "completely.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "audio"),
    oracle="""
WITH durs AS (
    SELECT doc_id,
           ('0x' || substring(md5(text), 9, 4))::INT % 2000 + 1 AS dur,
           ('0x' || substring(md5(text), 13, 2))::INT % 200 AS b
    FROM documents
)
SELECT doc_id, 8000 AS sample_rate,
       CAST(8 * dur AS BIGINT) AS n_samples,
       CAST(dur AS INT) AS duration_ms,
       CAST(b AS INT) AS min_sample,
       CAST(b + 1 AS INT) AS max_sample,
       CAST(8 * dur * b + (8 * dur) // 2 AS BIGINT) AS sum_samples,
       CAST(8 * dur * b + (8 * dur) // 2 AS DOUBLE) / (8 * dur)
           AS mean_sample
FROM durs
""",
)
def multimodal_wav_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_wav_square(docs)
    return MM.wav_sample_stats(media)


@register(
    "multimodal_wav_adpcm_stats",
    doc="REAL IMA-ADPCM decode (WAV format 17 — the r6 boundary's "
    "named next shrink): 4-bit block-compressed audio decoded "
    "block-by-block (predictor/step-index state machine, public IMA "
    "1992 spec tables), fact-chunk end trim, then the same sample "
    "aggregate as the PCM twin. The carried signal is the square "
    "wave, which IMA quantizes EXACTLY (+/-1 alternation at step "
    "index 0), so the oracle's closed form is valid against a lossy "
    "codec; the general encoder/decoder pair is fuzz-tested "
    "separately against an independent reference decoder; stereo's "
    "4-byte channel-word interleave decodes too. Remaining audio "
    "stub: mp3-in-wav (perceptual codec-lib territory).",
    tags=("multimodal", "pandas-udf", "binary", "codec", "audio"),
    oracle="""
WITH durs AS (
    SELECT doc_id,
           ('0x' || substring(md5(text), 9, 4))::INT % 250 + 1 AS dur,
           ('0x' || substring(md5(text), 13, 2))::INT % 200 AS b
    FROM documents
)
SELECT doc_id, 8000 AS sample_rate,
       CAST(8 * dur AS BIGINT) AS n_samples,
       CAST(dur AS INT) AS duration_ms,
       CAST(b AS INT) AS min_sample,
       CAST(b + 1 AS INT) AS max_sample,
       CAST(8 * dur * b + (8 * dur) // 2 AS BIGINT) AS sum_samples,
       CAST(8 * dur * b + (8 * dur) // 2 AS DOUBLE) / (8 * dur)
           AS mean_sample
FROM durs
""",
)
def multimodal_wav_adpcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_wav_adpcm(docs)
    return MM.wav_sample_stats(media)


@register(
    "multimodal_jpeg_pixel_stats",
    doc="REAL baseline JPEG decode (functions/jpeg.py — ITU-T T.81 "
    "sequential DCT, grayscale): marker walk, DQT/DHT parsing, "
    "Huffman entropy decode with byte unstuffing, differential DC, "
    "run-length AC, dezigzag, dequantization, full 2-D IDCT with "
    "level shift — the image stub that remained after PNG closed in "
    "r6. Payloads are blockwise-constant images whose even DC "
    "offsets quantize exactly under the Annex-K table (constant "
    "blocks have exactly-zero AC), so the closed-form oracle holds "
    "against a lossy codec; general (AC-carrying) encode/decode is "
    "fuzz-covered in pytest vs an independent reference decoder. "
    "Color (3-component MCU interleave, 4:4:4 and 4:2:0), DRI/RSTn "
    "restart markers and progressive (SOF2) decode ship in the "
    "sibling queries; honest remaining JPEG boundary: arithmetic "
    "coding.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "pixels"),
    oracle=f"""
WITH dims AS (
    SELECT doc_id,
           ('0x' || substring(md5(text), 1, 4))::INT % {MM.JPEG_BLOCKS_MOD} + 1 AS bw,
           ('0x' || substring(md5(text), 5, 4))::INT % {MM.JPEG_BLOCKS_MOD} + 1 AS bh,
           ('0x' || substring(md5(text), 9, 2))::INT AS base
    FROM documents
),
blocks AS (
    SELECT doc_id, bw, bh,
           128 + 2 * (((base + i) % {MM.JPEG_DC_RANGE}) - 24) AS v
    FROM dims, unnest(range(0, bw * bh)) AS t(i)
)
SELECT doc_id,
       CAST(MIN(bw) * 8 AS INT) AS width,
       CAST(MIN(bh) * 8 AS INT) AS height,
       CAST(COUNT(*) * 64 AS BIGINT) AS n_pixels,
       CAST(MIN(v) AS INT) AS min_pixel,
       CAST(MAX(v) AS INT) AS max_pixel,
       CAST(SUM(v) * 64 AS BIGINT) AS sum_pixel,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_pixel
FROM blocks
GROUP BY doc_id
""",
)
def multimodal_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_jpeg_blocks(docs)
    return MM.jpeg_pixel_stats(media)


@register(
    "multimodal_jpeg_progressive_stats",
    doc="REAL PROGRESSIVE JPEG decode (SOF2 — the r7 boundary's named "
    "dominant remaining real-world layout): six Huffman scans per "
    "image (interleavable DC first with point transform, spectral-"
    "selection AC bands, successive-approximation AC/DC refinements "
    "with EOB runs and buffered correction bits, T.81 Annex G) plus "
    "RSTn restarts every 5 blocks in EVERY scan, accumulated into a "
    "persistent coefficient store and IDCT'd once at EOI. Payloads "
    "are the SAME blockwise-constant images as the baseline query — "
    "successive approximation is lossless once all refinements land, "
    "so the baseline closed-form oracle carries over; the general "
    "(AC-carrying) path is differentially fuzzed in pytest: "
    "progressive decode must equal the baseline decode of the same "
    "quantized coefficients. Remaining JPEG boundary: arithmetic "
    "coding (SOF9/10).",
    tags=("multimodal", "pandas-udf", "binary", "codec", "pixels"),
    oracle=f"""
WITH dims AS (
    SELECT doc_id,
           ('0x' || substring(md5(text), 1, 4))::INT % {MM.JPEG_BLOCKS_MOD} + 1 AS bw,
           ('0x' || substring(md5(text), 5, 4))::INT % {MM.JPEG_BLOCKS_MOD} + 1 AS bh,
           ('0x' || substring(md5(text), 9, 2))::INT AS base
    FROM documents
),
blocks AS (
    SELECT doc_id, bw, bh,
           128 + 2 * (((base + i) % {MM.JPEG_DC_RANGE}) - 24) AS v
    FROM dims, unnest(range(0, bw * bh)) AS t(i)
)
SELECT doc_id,
       CAST(MIN(bw) * 8 AS INT) AS width,
       CAST(MIN(bh) * 8 AS INT) AS height,
       CAST(COUNT(*) * 64 AS BIGINT) AS n_pixels,
       CAST(MIN(v) AS INT) AS min_pixel,
       CAST(MAX(v) AS INT) AS max_pixel,
       CAST(SUM(v) * 64 AS BIGINT) AS sum_pixel,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_pixel
FROM blocks
GROUP BY doc_id
""",
)
def multimodal_jpeg_progressive_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_jpeg_progressive(docs)
    return MM.jpeg_pixel_stats(media)


@register(
    "multimodal_jpeg_color_stats",
    doc="REAL 4:4:4 COLOR JPEG decode: three-component MCU interleave "
    "(per-component DC predictors, separate luma/chroma quant "
    "tables), full per-plane entropy decode + IDCT, then the JFIF "
    "YCbCr->RGB conversion with half-up rounding. Payloads carry a "
    "per-block luma ramp + per-doc constant chroma with Q0=16 on "
    "both tables, so the planes recover exactly and the oracle "
    "replays the EXACT RGB conversion arithmetic in SQL. 4:2:0 "
    "subsampling (multimodal_jpeg_420_stats), DRI/RSTn restarts and "
    "progressive SOF2 (multimodal_jpeg_progressive_stats, "
    "multimodal_jpeg_progressive_color_stats) decode too; remaining "
    "JPEG boundary: arithmetic coding.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "pixels"),
    oracle=(_JPEG_COLOR_ORACLE := f"""
WITH dims AS (
    SELECT doc_id,
           ('0x' || substring(md5(text), 1, 4))::INT % {MM.JPEG_BLOCKS_MOD} + 1 AS bw,
           ('0x' || substring(md5(text), 5, 4))::INT % {MM.JPEG_BLOCKS_MOD} + 1 AS bh,
           ('0x' || substring(md5(text), 9, 2))::INT AS base,
           2.0 * (('0x' || substring(md5(text), 11, 2))::INT
                  % {MM.JPEG_CHROMA_RANGE} - 20) AS cb,
           2.0 * (('0x' || substring(md5(text), 13, 2))::INT
                  % {MM.JPEG_CHROMA_RANGE} - 20) AS cr
    FROM documents
),
px AS (
    SELECT doc_id, bw, bh,
           128 + 2 * (((base + i) % {MM.JPEG_DC_RANGE}) - 24) AS y,
           cb, cr
    FROM dims, unnest(range(0, bw * bh)) AS t(i)
),
rgb AS (
    SELECT doc_id, bw, bh,
           GREATEST(0, LEAST(255, CAST(FLOOR(y + 1.402 * cr + 0.5)
                                       AS INT))) AS r,
           GREATEST(0, LEAST(255, CAST(FLOOR(y - 0.344136 * cb
                                             - 0.714136 * cr + 0.5)
                                       AS INT))) AS g,
           GREATEST(0, LEAST(255, CAST(FLOOR(y + 1.772 * cb + 0.5)
                                       AS INT))) AS b
    FROM px
)
SELECT doc_id,
       CAST(MIN(bw) * 8 AS INT) AS width,
       CAST(MIN(bh) * 8 AS INT) AS height,
       CAST(COUNT(*) * 64 AS BIGINT) AS n_pixels,
       CAST(MIN(r) AS INT) AS min_r,
       CAST(MAX(r) AS INT) AS max_r,
       CAST(SUM(r) * 64 AS BIGINT) AS sum_r,
       CAST(SUM(g) * 64 AS BIGINT) AS sum_g,
       CAST(SUM(b) * 64 AS BIGINT) AS sum_b
FROM rgb
GROUP BY doc_id
"""),
)
def multimodal_jpeg_color_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_jpeg_color(docs)
    return MM.jpeg_rgb_stats(media)


@register(
    "multimodal_jpeg_progressive_color_stats",
    doc="PROGRESSIVE COLOR JPEG decode: the 4:4:4 color corpus "
    "re-encoded as multi-scan SOF2 — an INTERLEAVED DC first scan "
    "(all three components per MCU, separate predictors), per-"
    "component spectral AC first and successive-approximation "
    "refinement scans, DC refinement, RSTn restarts every 3 units in "
    "every scan. Same exact-recovery construction as the baseline "
    "color query (Q0=16 both tables, constant chroma), so the SAME "
    "closed-form RGB oracle holds; the interleaved-DC + per-component "
    "-AC geometry is exactly what real progressive color files do. "
    "Differentially fuzzed (progressive == baseline decode) in "
    "pytest. Remaining JPEG boundary: arithmetic coding.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "pixels"),
    oracle=_JPEG_COLOR_ORACLE,
)
def multimodal_jpeg_progressive_color_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_jpeg_color_progressive(docs)
    return MM.jpeg_rgb_stats(media)


@register(
    "multimodal_jpeg_420_stats",
    doc="REAL 4:2:0 SUBSAMPLED JPEG decode — the dominant real-world "
    "JPEG layout: each MCU interleaves FOUR raster-ordered luma "
    "blocks with one half-resolution Cb and Cr block; the decoder "
    "walks the T.81 A.2.3 MCU geometry, decodes every component at "
    "its own resolution and nearest-upsamples chroma. Constant "
    "per-doc chroma makes the 2x2 upsample exact, so the same "
    "closed-form RGB oracle as the 4:4:4 query holds on an even "
    "(16-px-aligned) block grid. Restart markers and progressive "
    "SOF2 decode in the sibling queries; remaining JPEG boundary: "
    "arithmetic coding.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "pixels"),
    oracle=(_JPEG_420_ORACLE := f"""
WITH dims AS (
    SELECT doc_id,
           2 * (('0x' || substring(md5(text), 1, 4))::INT % 2 + 1) AS bw,
           2 * (('0x' || substring(md5(text), 5, 4))::INT % 2 + 1) AS bh,
           ('0x' || substring(md5(text), 9, 2))::INT AS base,
           2.0 * (('0x' || substring(md5(text), 11, 2))::INT
                  % {MM.JPEG_CHROMA_RANGE} - 20) AS cb,
           2.0 * (('0x' || substring(md5(text), 13, 2))::INT
                  % {MM.JPEG_CHROMA_RANGE} - 20) AS cr
    FROM documents
),
px AS (
    SELECT doc_id, bw, bh,
           128 + 2 * (((base + i) % {MM.JPEG_DC_RANGE}) - 24) AS y,
           cb, cr
    FROM dims, unnest(range(0, bw * bh)) AS t(i)
),
rgb AS (
    SELECT doc_id, bw, bh,
           GREATEST(0, LEAST(255, CAST(FLOOR(y + 1.402 * cr + 0.5)
                                       AS INT))) AS r,
           GREATEST(0, LEAST(255, CAST(FLOOR(y - 0.344136 * cb
                                             - 0.714136 * cr + 0.5)
                                       AS INT))) AS g,
           GREATEST(0, LEAST(255, CAST(FLOOR(y + 1.772 * cb + 0.5)
                                       AS INT))) AS b
    FROM px
)
SELECT doc_id,
       CAST(MIN(bw) * 8 AS INT) AS width,
       CAST(MIN(bh) * 8 AS INT) AS height,
       CAST(COUNT(*) * 64 AS BIGINT) AS n_pixels,
       CAST(MIN(r) AS INT) AS min_r,
       CAST(MAX(r) AS INT) AS max_r,
       CAST(SUM(r) * 64 AS BIGINT) AS sum_r,
       CAST(SUM(g) * 64 AS BIGINT) AS sum_g,
       CAST(SUM(b) * 64 AS BIGINT) AS sum_b
FROM rgb
GROUP BY doc_id
"""),
)
def multimodal_jpeg_420_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_jpeg_420(docs)
    return MM.jpeg_rgb_stats(media)


@register(
    "multimodal_jpeg_progressive_420_stats",
    doc="PROGRESSIVE 4:2:0 JPEG decode — THE dominant real-world "
    "photo layout (SOF2 + 2x2 chroma subsampling combined): the "
    "interleaved DC scans walk the 16-px MCU grid (four luma blocks "
    "+ Cb + Cr per MCU, padding blocks in the predictor chain), the "
    "per-component AC first/refinement scans walk each component's "
    "OWN block grid at its own resolution, RSTn restarts every 3 "
    "units. Same exact-recovery corpus and closed-form RGB oracle as "
    "the baseline 4:2:0 query; differentially fuzzed (progressive == "
    "baseline 4:2:0 decode, including odd non-MCU-aligned dims). "
    "Remaining JPEG boundary: arithmetic coding.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "pixels"),
    oracle=_JPEG_420_ORACLE,
)
def multimodal_jpeg_progressive_420_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_jpeg_420_progressive(docs)
    return MM.jpeg_rgb_stats(media)


@register(
    "multimodal_wav_ms_adpcm_stats",
    doc="REAL MS-ADPCM decode (WAV format 2 — the Microsoft WAVE "
    "spec's coefficient-predicted 4-bit codec, the other half of the "
    "ADPCM family next to IMA): per-block per-channel 7-byte headers "
    "(predictor index, delta, two seed samples), high-nibble-first "
    "codes, adaptive delta via the published 16-entry table. The "
    "carried signal is an amplitude-16 square wave, which predictor 0 "
    "+ initial delta 16 quantizes EXACTLY (delta pins at its 16 "
    "floor), so the closed-form oracle stays valid against a lossy "
    "codec; the general encoder/decoder pair is fuzz-covered in "
    "pytest. Audio boundary after this: mp3-in-wav only.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "audio"),
    oracle="""
WITH durs AS (
    SELECT doc_id,
           ('0x' || substring(md5(text), 9, 4))::INT % 250 + 1 AS dur,
           ('0x' || substring(md5(text), 13, 2))::INT % 200 AS b
    FROM documents
)
SELECT doc_id, 8000 AS sample_rate,
       CAST(8 * dur AS BIGINT) AS n_samples,
       CAST(dur AS INT) AS duration_ms,
       CAST(b AS INT) AS min_sample,
       CAST(b + 16 AS INT) AS max_sample,
       CAST(8 * dur * b + 16 * ((8 * dur) // 2) AS BIGINT) AS sum_samples,
       CAST(8 * dur * b + 16 * ((8 * dur) // 2) AS DOUBLE) / (8 * dur)
           AS mean_sample
FROM durs
""",
)
def multimodal_wav_ms_adpcm_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_wav_ms_adpcm(docs)
    return MM.wav_sample_stats(media)


# G.711 decode replayed as pure SQL arithmetic (the CCITT reference
# branch structure; {b} is the companded byte expression)
_DUCK_ULAW = """(
    CASE WHEN (255 - ({b})) >= 128
         THEN 132 - (((((255 - ({b})) % 16) * 8) + 132)
                     << ((((255 - ({b})) // 16) % 8)))
         ELSE (((((255 - ({b})) % 16) * 8) + 132)
               << ((((255 - ({b})) // 16) % 8))) - 132
    END)"""
_DUCK_ALAW = """(
    CASE WHEN xor(({b}), 85) >= 128 THEN 1 ELSE -1 END *
    CASE ((xor(({b}), 85) // 16) % 8)
         WHEN 0 THEN (xor(({b}), 85) % 16) * 16 + 8
         WHEN 1 THEN (xor(({b}), 85) % 16) * 16 + 264
         ELSE ((xor(({b}), 85) % 16) * 16 + 264)
              << (((xor(({b}), 85) // 16) % 8) - 1)
    END)"""


@register(
    "multimodal_wav_g711_stats",
    doc="REAL G.711 telephony decode (WAV formats 6/7 — A-law and "
    "mu-law, the last named audio stubs after r7's ADPCM): each "
    "document carries a full-range companded byte sweep in BOTH laws; "
    "the decoder expands every code point through the CCITT "
    "segment/mantissa arithmetic and the oracle REPLAYS that exact "
    "arithmetic in SQL over a generated byte series — an independent "
    "spec re-implementation, not a copied table. Output long-form, "
    "one row per (doc, law). Audio boundary after this: mp3-in-wav "
    "only (perceptual codec-lib territory; MS-ADPCM decodes too — "
    "multimodal_wav_ms_adpcm_stats).",
    tags=("multimodal", "pandas-udf", "binary", "codec", "audio"),
    oracle=f"""
WITH durs AS (
    SELECT doc_id,
           ('0x' || substring(md5(text), 9, 4))::INT % {MM.G711_DUR_MOD} + 1
               AS dur,
           ('0x' || substring(md5(text), 13, 2))::INT AS b0
    FROM documents
),
bytes AS (
    SELECT doc_id, law, ((b0 + 7 * i) % 256) AS b
    FROM durs,
         unnest(range(0, 8 * dur)) AS t(i),
         (SELECT unnest(['ulaw', 'alaw']) AS law)
),
decoded AS (
    SELECT doc_id, law,
           CASE WHEN law = 'ulaw' THEN {_DUCK_ULAW.format(b='b')}
                ELSE {_DUCK_ALAW.format(b='b')} END AS v
    FROM bytes
)
SELECT doc_id, law,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(MIN(v) AS INT) AS min_sample,
       CAST(MAX(v) AS INT) AS max_sample,
       CAST(SUM(v) AS BIGINT) AS sum_samples
FROM decoded
GROUP BY doc_id, law
""",
)
def multimodal_wav_g711_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_wav_g711(docs)
    return MM.wav_g711_stats(media)


@register(
    "payload_inflate_roundtrip",
    doc="F14 zlib payload inflation (inflateResponse, "
    "extract_flomatika_insights_processor.ts:88-103): documents are "
    "deflated + base64-encoded (the reference API's wire format), then "
    "base64-decoded JVM-side (unbase64) and inflated by the "
    "Arrow-batched zlib UDF; a corrupt payload (every 10th doc gets a "
    "truncated stream) nulls out instead of failing the task. The "
    "oracle knows the expected round-trip without inflating: ok iff "
    "not corrupted, recovered length = original length.",
    tags=("multimodal", "pandas-udf", "binary", "codec"),
    oracle="""
SELECT doc_id,
       (doc_id % 10 <> 0) AS roundtrip_ok,
       CASE WHEN doc_id % 10 <> 0 THEN strlen(text)::BIGINT END
           AS inflated_chars
FROM documents
""",
)
def payload_inflate_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.functions.compression import (
        zlib_deflate,
        zlib_inflate,
    )

    docs = load_table(spark, sf_dir, "documents")
    wire = docs.select(
        "doc_id",
        F.base64(zlib_deflate(F.encode("text", "UTF-8"))).alias("b64"),
    )
    # corrupt every 10th payload: truncate the stream so inflate fails
    corrupted = wire.withColumn(
        "b64",
        F.when(
            F.col("doc_id") % 10 == 0, F.substring("b64", 1, 8)
        ).otherwise(F.col("b64")),
    )
    inflated = corrupted.select(
        "doc_id", zlib_inflate(F.unbase64(F.col("b64"))).alias("raw")
    )
    return inflated.select(
        "doc_id",
        F.col("raw").isNotNull().alias("roundtrip_ok"),
        F.length(F.decode("raw", "UTF-8")).cast("long").alias("inflated_chars"),
    )


# Y4M dims/base/frames derivation shared by the two video oracles
_DUCK_Y4M_DIMS = """
SELECT doc_id,
       ('0x' || substring(md5(text), 1, 4))::INT % 16 + 1 AS w,
       ('0x' || substring(md5(text), 5, 4))::INT % 16 + 1 AS h,
       ('0x' || substring(md5(text), 9, 2))::INT % 200 AS b,
       ('0x' || substring(md5(text), 13, 2))::INT % 8 + 1 AS n
FROM documents
"""


@register(
    "multimodal_y4m_frame_stats",
    doc="REAL video decode (third real codec): monochrome Y4M clips "
    "(YUV4MPEG2 — uncompressed planar frames behind FRAME markers; "
    "frame k pixel = b+x+y+k) built per document and decoded by "
    "decode_y4m_frames (header token parse + fixed-size frame walk), "
    "then whole-clip luma statistics. The oracle replays the "
    "closed-form three-axis gradient sums — matching requires walking "
    "every frame. Video is no longer a synthetic-only stub; chroma-"
    "plane colour spaces decode too (multimodal_y4m_chroma_stats); "
    "remaining media stubs are perceptual codecs (mp3/h264) and "
    "arithmetic-coded JPEG. Map-only.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "video"),
    oracle=f"""
WITH dims AS ({_DUCK_Y4M_DIMS})
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(n AS INT) AS n_frames, 25.0 AS fps,
       CAST(n * w * h AS BIGINT) AS n_luma,
       CAST(b AS INT) AS min_luma,
       CAST(b + w + h + n - 3 AS INT) AS max_luma,
       CAST(n*w*h*b + n*(h*(w*(w-1))//2 + w*(h*(h-1))//2)
            + w*h*(n*(n-1))//2 AS BIGINT) AS sum_luma,
       CAST(n*w*h*b + n*(h*(w*(w-1))//2 + w*(h*(h-1))//2)
            + w*h*(n*(n-1))//2 AS DOUBLE) / (n * w * h) AS mean_luma
FROM dims
""",
)
def multimodal_y4m_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_y4m(docs)
    return MM.y4m_frame_stats(media)


@register(
    "multimodal_y4m_chroma_stats",
    doc="Y4M chroma-plane stride decode (r8 — closes the 411/422/"
    "siting-variant boundary): clips carry REAL Cb/Cr planes with the "
    "colour space rotated per doc (444 full, 422 half-width, 411 "
    "quarter-width, 420mpeg2 2x2), so decode_y4m_frames must compute "
    "each space's frame stride to slice luma correctly — a one-byte "
    "stride error shears every later frame. The luma gradient and "
    "dims match the mono corpus, so the same closed-form oracle "
    "holds. Remaining Y4M boundary: >8-bit taggings (420p10/p16), "
    "interlaced chroma.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "video"),
    oracle=f"""
WITH dims AS ({_DUCK_Y4M_DIMS})
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(n AS INT) AS n_frames, 25.0 AS fps,
       CAST(n * w * h AS BIGINT) AS n_luma,
       CAST(b AS INT) AS min_luma,
       CAST(b + w + h + n - 3 AS INT) AS max_luma,
       CAST(n*w*h*b + n*(h*(w*(w-1))//2 + w*(h*(h-1))//2)
            + w*h*(n*(n-1))//2 AS BIGINT) AS sum_luma,
       CAST(n*w*h*b + n*(h*(w*(w-1))//2 + w*(h*(h-1))//2)
            + w*h*(n*(n-1))//2 AS DOUBLE) / (n * w * h) AS mean_luma
FROM dims
""",
)
def multimodal_y4m_chroma_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_y4m_chroma(docs)
    return MM.y4m_frame_stats(media)


@register(
    "multimodal_y4m_sampled_frames",
    doc=f"Frame sampling over REAL video: every "
    f"{MM.Y4M_SAMPLE_EVERY}nd frame of each Y4M clip is decoded and "
    "emitted as its own row with per-frame luma stats — the "
    "binary->frames fan-out (training-data frame subsample stage) "
    "running on an actual container instead of the synthetic stub "
    "(multimodal_frame_sample keeps the stub twin for the fan-out "
    "plan shape). Oracle replays the per-frame closed form with a "
    "range unnest over sampled indices. Map-only.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "video", "explode"),
    oracle=f"""
WITH dims AS ({_DUCK_Y4M_DIMS})
SELECT doc_id, CAST(k AS INT) AS frame_idx,
       CAST(w*h*(b + k) + h*(w*(w-1))//2 + w*(h*(h-1))//2 AS BIGINT)
           AS sum_luma,
       CAST(w*h*(b + k) + h*(w*(w-1))//2 + w*(h*(h-1))//2 AS DOUBLE)
           / (w * h) AS mean_luma
FROM dims, unnest(range(0, n, {MM.Y4M_SAMPLE_EVERY})) AS t(k)
""",
)
def multimodal_y4m_sampled_frames(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_y4m(docs)
    return MM.y4m_sampled_frame_stats(media)


@register(
    "audio_silence_trim",
    doc="Audio preprocessing: REAL silence trim — silence-padded PCM "
    "clips (8 kHz square wave with md5-derived lead/tail padding at "
    "the 8-bit midpoint) decode sample-by-sample and strip the exact-"
    "silence lead/tail runs, reporting millisecond spans. The oracle "
    "replays the padding arithmetic — matching requires actually "
    "scanning the samples from both ends. Map-only.",
    tags=("multimodal", "pandas-udf", "binary", "codec", "audio"),
    oracle="""
SELECT doc_id,
       CAST(dur + lead + tail AS BIGINT) AS total_ms,
       CAST(lead AS BIGINT) AS lead_silence_ms,
       CAST(dur AS BIGINT) AS signal_ms,
       CAST(tail AS BIGINT) AS tail_silence_ms
FROM (
    SELECT doc_id,
           ('0x' || substring(md5(text), 9, 4))::INT % 500 + 1 AS dur,
           ('0x' || substring(md5(text), 15, 2))::INT % 50 AS lead,
           ('0x' || substring(md5(text), 17, 2))::INT % 50 AS tail
    FROM documents
)
""",
)
def audio_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload_wav_padded(docs)
    return MM.wav_silence_trim_stats(media)
