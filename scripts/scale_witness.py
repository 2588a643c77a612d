"""r17 scale witness (r16 verdict #7): time the shape-changed
families on a 10x replica of sf0.1 (~6M lineitem rows / 50k docs,
disjoint key spaces via scale_probe.build_replicated_dir) so the
8-core vs 32-core ratio can witness parallel scaling that sf0.1's
overhead-dominated entries cannot.

The gated scale shapes (mix two-phase, KMV/top-k bucket prunes,
card-key fusion) are FORCED via their confs: the replica's tables are
still far below the 256 MiB production thresholds (the base tables
are ~MBs), and the witness's purpose is to measure the production
shapes' parallelism, not the gate decision.

Usage: SPARK_GRAFT_CPUS=<n> python scripts/scale_witness.py [out.json]
Writes per-query medians; combine two runs (8/32) into the committed
SCALE_WITNESS_r17.json table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from falcon_metrics_etl_spark.plans.registry import all_queries
from falcon_metrics_etl_spark.session import get_spark
from falcon_metrics_etl_spark.sources import load_table
from scale_probe import build_replicated_dir

FACTOR = 10
# forced production shapes (see module docstring)
FORCED_CONFS = {
    "spark.falconMetricsEtl.mixTwoPhaseMinBytes": "0",
    "spark.falconMetricsEtl.kmvBucketPruneMinBytes": "0",
    "spark.falconMetricsEtl.topkBucketPruneMinBytes": "0",
    "spark.falconMetricsEtl.cardKeyFuseMinBytes": "0",
    "spark.falconMetricsEtl.recallTopkSplitMinBytes": "0",
}
QUERIES = [
    # keep-best family (r16 broadcast-hinted labels)
    "media_dedup_keep_best",
    # pair-dedup family (r16 payload shedding)
    "media_near_dup_pairs",
    # KMV family (r16 bucket prune, r17 gated)
    "kmv_distinct_users",
    "kmv_set_ops_pairs",
    # mix two-phase (r16, r17 gated + clamped)
    "domain_mix_token_budget",
    "domain_temperature_mix",
    # top-k bucket prune (r16, r17 gated)
    "top_orders_per_priority",
    # r17 shapes
    "kanbanize_card_states",
    "char_entropy_scores",
    "ann_ivf_probed",
    "ann_int8_recall",
]
REPEATS = 3


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark("scale_witness")
    for k, v in FORCED_CONFS.items():
        spark.conf.set(k, v)
    rep_dir = build_replicated_dir(spark, "/root/testdata/sf0.1", FACTOR)
    print("replica:", rep_dir, flush=True)
    reg = all_queries()
    results: dict[str, dict] = {}
    for name in QUERIES:
        runs = []
        for _ in range(REPEATS):
            t0 = time.time()
            reg[name].spark(spark, rep_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        runs.sort()
        results[name] = {"median": runs[len(runs) // 2], "runs": runs}
        print(name, results[name], flush=True)

    # tick family witness: stage a 10x base, tick the ~6% delta
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from falcon_metrics_etl_spark.plans.media_dedup import MEDIA_DELTA_MOD
    from falcon_metrics_etl_spark.streaming.media_tick import (
        media_ingest_tick,
        stage_media_state,
    )

    state_dir = tempfile.mkdtemp(prefix="scale_witness_tick_")
    docs = load_table(spark, rep_dir, "documents").select("doc_id")
    base = docs.filter(F.col("doc_id") % MEDIA_DELTA_MOD != 0)
    delta = docs.filter(F.col("doc_id") % MEDIA_DELTA_MOD == 0).persist()
    delta.write.format("noop").mode("overwrite").save()
    t0 = time.time()
    stage_media_state(spark, base, state_dir, batch_id=0)
    stage_sec = round(time.time() - t0, 3)
    runs = []
    for _ in range(REPEATS):
        t0 = time.time()
        media_ingest_tick(
            spark, delta, state_dir, batch_id=1,
            maintenance_file_threshold=None,
        )
        runs.append(round(time.time() - t0, 3))
    runs.sort()
    results["media_incremental_tick"] = {
        "median": runs[len(runs) // 2], "runs": runs,
        "stage_backfill_sec": stage_sec,
    }
    print("media_incremental_tick", results["media_incremental_tick"],
          flush=True)
    delta.unpersist()
    shutil.rmtree(state_dir, ignore_errors=True)

    payload = {
        "factor": FACTOR,
        "base_sf_dir": "/root/testdata/sf0.1",
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "0")),
        "repeats": REPEATS,
        "forced_confs": FORCED_CONFS,
        "queries": results,
    }
    line = json.dumps(payload)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
