"""Scale-linearity probe: replicate the sf-dir N x with disjoint key
spaces and compare per-query wall clock at 1x vs Nx.

The point is the SHAPE of the curve, not absolute numbers: a per-key /
scan-linear plan should move well under Nx when fixed overhead still
dominates at this size, and never superlinearly. Pair-generating
queries (near-dup/ANN) are excluded by default — replicating identical
texts manufactures cross-replica duplicate pairs, which measures the
synthetic data, not the plan.

Usage:
    python scripts/scale_probe.py [sf_dir] [factor] [query ...]

Writes the replicated tables to /tmp/scale_probe_<factor>x (reused if
present) and prints one line per query: name, t_1x, t_Nx, ratio.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.plans.registry import all_queries
from falcon_metrics_etl_spark.session import get_spark
from falcon_metrics_etl_spark.sources import load_table
from falcon_metrics_etl_spark.sources.tables import TABLES

# per-key / scan-linear operators: safe and meaningful under replication
DEFAULT_QUERIES = [
    "transition_compression",
    "sessionization",
    "last_change_of_day",
    "ado_blocked_stream",
    "hypertable_rollup_events",
    "kmv_distinct_users",
    "asof_last_view_before_purchase",
    "range_join_error_windows",
    "tumbling_daily",
    "event_dates_expr",
    "repetition_quality_flags",
    "text_quality_scores",
    "token_counting",
    "doc_fingerprint_winnowing",
    "sequence_packing",
    "tpch_pricing_summary",
    "flag_field_discovery",
    "filler_counts_typed",
    "multimodal_decode_png",
    "multimodal_decode_wav",
    "bm25_topk",
    "histogram_quantiles_price",
    "domain_mix_token_budget",
    "pagerank_purchase_graph",
    "referential_integrity_audit",
    "kmv_set_ops_pairs",
    # round-4 operators
    "kanbanize_card_states",
    "sprint_bridge",
    "unigram_surprisal_scores",
    "domain_temperature_mix",
    "multimodal_png_pixel_stats",
    "multimodal_wav_sample_stats",
    "payload_inflate_roundtrip",
    "zorder_locality_stats",
    # round-5/6 operators. NOT here by design: dedup_keep_best_lsh and
    # minhash_incremental_update are pair-generating — replicating
    # identical texts manufactures cross-replica duplicate pairs, which
    # measures the synthetic data, not the plan (their hot-key story is
    # covered by the skew probe's boilerplate corpus instead).
    "substring_dedup_windows",
    "multimodal_png_color_pixel_stats",
    "event_dates_routed",
    "substring_dedup_spans",
    "substring_dedup_scrub",
    "substring_incremental_flags",
    "multimodal_png_depth16_interlace_stats",
    "multimodal_y4m_frame_stats",
    "multimodal_y4m_sampled_frames",
    "epoch_shuffle_assignment",
    "table_profile_stats",
    "table_profile_kmv",
    "audio_silence_trim",
    # round-7 operators: scan-side classifier HOF, bigram LM (count
    # shuffles + count-table joins), ADPCM block decode (map-only)
    "quality_classifier_scores",
    "bigram_surprisal_scores",
    "multimodal_wav_adpcm_stats",
    # round-8 operators: progressive JPEG + Y4M chroma strides
    # (map-only Arrow decode), xxhash64 classifier/audit twins
    # (scan-side HOFs), the fused CFD plans
    "multimodal_jpeg_progressive_stats",
    "multimodal_y4m_chroma_stats",
    "quality_classifier_scores_fast",
    "corpus_cleaning_audit_fast",
    "cfd",
    "cfd_incremental_update",
    # round-11 operators: unigram-LM tokenizer (vocab-bounded EM +
    # dictionary encode — replication multiplies word counts, the
    # sketch and vocabulary are unchanged, encode scales with docs),
    # spectral audio fingerprint (map-only integer DFT). The media
    # PAIR queries replicate meaningfully too (payloads derive from
    # doc_id, so fresh replicas mint fresh content groups — pair
    # volume scales linearly, not cross-replica-quadratically); run
    # them by naming them explicitly, as r10/r11 SCALE.md did.
    "ulm_train_vocab",
    "ulm_encode_stats",
    "audio_fingerprint_spectral",
]

# key columns to offset per replica, per table (disjoint key spaces)
_KEY_OFFSETS = {
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
    "customer": ("c_custkey",),
}


def build_replicated_dir(spark, sf_dir: str, factor: int) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/scale_probe_{tag}_{factor}x"
    if os.path.isdir(out) and os.listdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        keys = _KEY_OFFSETS.get(name, ())
        if keys:
            offsets = {k: df.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
            parts = []
            for i in range(factor):
                part = df
                for k, span in offsets.items():
                    part = part.withColumn(k, F.col(k) + F.lit(i * span))
                parts.append(part)
            rep = parts[0]
            for p in parts[1:]:
                rep = rep.unionByName(p)
        else:
            rep = df  # pure dims (region/nation/...): keep as-is
        rep.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    return out


def time_query(q, spark, sf_dir: str) -> float:
    # one UNTIMED warmup: 1x is always timed before Nx, so codegen/JIT
    # warming of the query shape would otherwise bias ratios LOW
    # (same artifact the skew probe's r10 warmup fix documents)
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    factor = int(args[1]) if len(args) > 1 else 5
    names = args[2:] or DEFAULT_QUERIES

    spark = get_spark("scale_probe")
    rep_dir = build_replicated_dir(spark, sf_dir, factor)
    registry = all_queries()

    print(f"# scale probe: {sf_dir} vs {factor}x replica ({rep_dir})")
    print(f"{'query':34s} {'t_1x':>7s} {'t_' + str(factor) + 'x':>7s} {'ratio':>6s}")
    for name in names:
        q = registry[name]
        t1 = time_query(q, spark, sf_dir)
        tn = time_query(q, spark, rep_dir)
        print(f"{name:34s} {t1:7.2f} {tn:7.2f} {tn / t1:6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
