"""Shuffle-count regression pins for flagship plans.

Each entry is a HARD CEILING on visible Exchange nodes in the
executed plan at smoke scale — the structural wins rounds 7-8 paid
for (fused rollups, exchange-free sketch algebra, bucketed layouts)
must not silently regress when someone edits an operator. Ceilings
are the CURRENT count (see PLAN_AUDIT_r8), not aspirational lows;
loosen one only with a plan-audit diff explaining why.
"""

from __future__ import annotations

import re

import pytest

from falcon_metrics_etl_spark.plans.registry import all_queries

# query -> max allowed shuffle Exchange nodes (BroadcastExchange not
# counted, same regex as scripts/plan_audit.py)
BUDGETS = {
    "cfd": 2,                       # r8 fused single-rollup + explode
    "cfd_incremental_update": 3,    # r8: checkpointed gold, was 8
    # NOTE: the 0 covers the POST-perf_checkpoint subtree only (the
    # checkpoint truncates the visible plan); the sketch build's own
    # exchanges are pinned by the full-plan budget below
    "kmv_set_ops_pairs": 0,         # r8 array-sketch algebra, was 9
    "table_profile_stats": 2,       # r7 fused unpivot, was 9
    "corpus_cleaning_audit": 1,     # one window over the fingerprint
    "corpus_cleaning_audit_fast": 1,
    "quality_classifier_scores": 0,  # scan-side HOF only
    "quality_classifier_scores_fast": 0,
    # Arrow decode stages: one pre-explode fan-out Exchange of the
    # small (doc_id, text) rows, then map-only decode (r8 _fan_out —
    # a 1-split scan serialized the codec matrix on one core)
    "multimodal_jpeg_progressive_stats": 1,
    "multimodal_y4m_chroma_stats": 1,
    "tpch_pricing_summary": 1,
    "dedup_exact_fingerprint": 1,
    "bpe_train_merges": 1,          # one word-count shuffle
    "ulm_train_vocab": 1,           # r11: same word-count shuffle
    # r11 unigram-LM encode: distinct-word dict + dictionary join
    # back + final doc agg (the 1-row vocab array rides a broadcast)
    "ulm_encode_stats": 3,
    "referential_integrity_audit": 2,  # r9 shared unpivot, was 9
    "kanbanize_card_states": 5,     # unbucketed floor (r6-r8 verdicts)
    # r10 perceptual dHash: decode is map-only behind the one fan-out
    # Exchange; pairing adds the banded self-join + distinct (never
    # all-pairs — budget allows the SMJ shape AQE picks at scale)
    "media_fingerprint_dhash": 1,
    "media_near_dup_pairs": 4,
    "video_fingerprint_frames": 1,
    # keep-best: banded pairs + the label-propagation join/agg rounds
    # visible past the components loop's checkpoints
    "media_dedup_keep_best": 4,
    "video_near_dup_pairs": 5,   # distinct + self-join + pair agg
    "audio_fingerprint_energy": 1,
    "audio_near_dup_pairs": 4,
    # r10 one-scan user-keyed fusion (was 6): visible = grid + sizes
    # aggs off the checkpointed per-user frame (full-plan pin below)
    "cohort_retention_weekly": 2,
    # r10 histogram fusion (was 7): hist sits behind a perf checkpoint
    # (full-plan pin below); the visible 5 = uni marginal x3 consumers
    # (each a CHEAP re-agg of the checkpointed vocab-bounded hist —
    # A/B'd faster than a second checkpoint) + stats + final doc agg
    "bigram_surprisal_scores": 5,
}


@pytest.mark.parametrize("name,budget", sorted(BUDGETS.items()))
def test_shuffle_budget(spark, sf_smoke, name, budget):
    df = all_queries()[name].spark(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    shuffles = len(re.findall(r"\bExchange\b", plan))
    assert shuffles <= budget, (
        f"{name}: {shuffles} shuffle exchanges > pinned budget {budget} "
        "— a structural plan regression (see PLAN_AUDIT history)"
    )


# Budgets re-checked with perf checkpoints DISABLED: a lazy
# localCheckpoint truncates the visible executed plan, so the plain
# budget above cannot see exchanges upstream of the checkpoint (r9
# advisor: kmv's 0 hid the sketch build's real shuffles — an upstream
# regression would not have tripped the pin). The conf gate makes the
# FULL lineage plan visible; the committed r8 win was 9 -> this count.
FULL_PLAN_BUDGETS = {
    # r16 §8 added the bucketed min-K prune (operators/rollup.py
    # _kmv_sketch: +1 bounded rank Exchange per sketch, 4 -> 6 with
    # checkpoints off — the un-updated pin was r16's one red test);
    # r17 size-gates the prune (verdict #6), so below the threshold
    # the smoke plan is the original 4. tests/test_relational_gates.py
    # pins the gated two-phase path row-identical.
    "kmv_set_ops_pairs": 4,
    # checkpoints-off re-derives hist per consumer (4x) + uni (3x);
    # the EXECUTED default-mode total is 4 (hist, uni, stats, doc agg)
    "bigram_surprisal_scores": 9,
    # checkpoints-off re-derives per_user for grid + sizes
    "cohort_retention_weekly": 4,
}


@pytest.mark.parametrize("name,budget", sorted(FULL_PLAN_BUDGETS.items()))
def test_shuffle_budget_full_plan(spark, sf_smoke, name, budget):
    from falcon_metrics_etl_spark.session import PERF_CHECKPOINT_CONF

    spark.conf.set(PERF_CHECKPOINT_CONF, "false")
    try:
        df = all_queries()[name].spark(spark, sf_smoke)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset(PERF_CHECKPOINT_CONF)
    shuffles = len(re.findall(r"\bExchange\b", plan))
    assert shuffles <= budget, (
        f"{name}: {shuffles} full-plan shuffle exchanges > pinned "
        f"budget {budget} — a regression upstream of the perf "
        "checkpoint (see PLAN_AUDIT history)"
    )
