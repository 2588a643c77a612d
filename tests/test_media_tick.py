"""Incremental perceptual-media ingest tick (streaming/media_tick.py):
delta images/clips are decoded delta-only, probe the persisted band /
frame-hash indexes, and append only when admitted — idempotent under
replay, verdicts agreeing with the batch pair queries' semantics.

The dHash fixture groups doc_ids in fours around one luma surface
(variant = doc_id % 4) and the video fixture in threes around one
clip (trim-and-extend variants), so a batch doc whose doc_id lands in
a group the base corpus already covers is a planted near-duplicate."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from falcon_metrics_etl_spark.functions import multimodal as MM
from falcon_metrics_etl_spark.plans.media_dedup import (
    DHASH_HAMMING_T,
    VIDEO_SHARED_T,
)
from falcon_metrics_etl_spark.streaming.media_tick import (
    media_ingest_tick,
    stage_media_state,
)


def _docs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _counts(spark, state_dir):
    out = {}
    for name in ("fp_index", "band_index", "frame_index", "media_flags"):
        out[name] = spark.read.parquet(f"{state_dir}/{name}").count()
    return out


def _flags(spark, state_dir):
    return {
        (r["doc_id"], r["modality"]): r["status"]
        for r in spark.read.parquet(f"{state_dir}/media_flags").collect()
    }


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("media_state"))
    # base corpus: image groups 0..4 fully (ids 0..19); video groups
    # 0..6 via the same ids (VIDEO_GROUP=3)
    stage_media_state(spark, _docs(spark, range(20)), state, batch_id=0)
    return state


def _expected_image_verdicts(spark, base_ids, batch_ids):
    """Batch-semantics twin: Hamming <= T vs base or smaller-id mate."""
    fp = {
        r["doc_id"]: r["dhash"]
        for r in MM.media_dhash(
            MM.attach_payload_dhash_corpus(
                _docs(spark, list(base_ids) + list(batch_ids))
            )
        ).collect()
    }
    out = {}
    for b in batch_ids:
        others = list(base_ids) + [x for x in batch_ids if x < b]
        dup = any(
            bin(fp[b] ^ fp[o]).count("1") <= DHASH_HAMMING_T for o in others
        )
        out[b] = "dropped:near_dup" if dup else "kept"
    return out


def test_tick_admits_fresh_rejects_group_mates(spark, staged):
    # batch ids: 22 (image group 5 — fresh; video group 7 — fresh),
    # 100 and 200 (both image- and video-fresh, and NOT group mates
    # of each other in either fixture)
    batch = [22, 100, 200]
    # stage ids 0..19: image groups 0..4 (all variants of group 4 are
    # 16..19), video groups 0..6 (ids 18,19 are group-6 variants 0,1)
    media_ingest_tick(spark, _docs(spark, batch), staged, batch_id=1)
    flags = _flags(spark, staged)

    exp_img = _expected_image_verdicts(spark, range(20), batch)
    for b in batch:
        assert flags[(b, "image")] == exp_img[b]

    # video: id 22 = group 7 variant 1 — group 7 has NO staged clip
    # (staged ids reach group 6), and 100/200 sit in fresh groups with
    # no batch mate in the same group -> every clip admitted
    for b in batch:
        assert flags[(b, "video")] == "kept"

    # now a second batch planting a TRUE video near-dup: id 20 is
    # group-6 variant 2, sharing 4 frames with staged ids 18/19
    media_ingest_tick(spark, _docs(spark, [20]), staged, batch_id=2)
    flags = _flags(spark, staged)
    assert flags[(20, "video")] == "dropped:near_dup"
    # image side: 20 is group-5 variant 0 — group 5 has only id 22
    # (variant 2) admitted; verdict must match the batch semantics
    exp = _expected_image_verdicts(spark, list(range(20)) + [22], [20])
    assert flags[(20, "image")] == exp[20]

    # indexes only carry admitted docs
    fp_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{staged}/fp_index").collect()
    }
    assert (20 in fp_ids) == (exp[20] == "kept")
    frame_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{staged}/frame_index").collect()
    }
    assert 20 not in frame_ids and 22 in frame_ids


def test_replay_is_idempotent(spark, staged):
    before = _counts(spark, staged)
    flags_before = _flags(spark, staged)
    # replay BOTH earlier batches with their original batch_ids
    media_ingest_tick(spark, _docs(spark, [22, 100, 200]), staged, batch_id=1)
    media_ingest_tick(spark, _docs(spark, [20]), staged, batch_id=2)
    assert _counts(spark, staged) == before
    assert _flags(spark, staged) == flags_before


def test_video_shared_threshold_pins_group_distance(spark):
    # group-mate clips share VIDEO_FRAMES - |v1 - v2| frames; variant
    # distance 2 shares exactly 4 >= VIDEO_SHARED_T, cross-group 0
    a, b = 18, 20  # group 6 variants 0 and 2
    sig = (
        MM.video_frame_dhash(
            MM.attach_payload_video_clips(_docs(spark, [a, b, 100]))
        )
        .select("doc_id", "frame_dhash")
        .distinct()
        .collect()
    )
    by_doc = {}
    for r in sig:
        by_doc.setdefault(r["doc_id"], set()).add(r["frame_dhash"])
    assert len(by_doc[a] & by_doc[b]) == MM.VIDEO_FRAMES - 2
    assert len(by_doc[a] & by_doc[100]) == 0
    assert MM.VIDEO_FRAMES - 2 >= VIDEO_SHARED_T
