"""Physical-plan audit across the whole query registry.

For every registered query, prints one line:

    name  shuffles=N  bcast=N  sortmerge=N  codegen=N  scans=N/P  [flags]

flags:
  CARTESIAN  — CartesianProduct or BroadcastNestedLoopJoin in the plan
               (allowed only for the documented brute-force baselines)
  NOPUSH     — a Filter sits DIRECTLY above a parquet scan whose
               PushedFilters is empty (structural check on the plan
               tree indentation, r7). Filters elsewhere in the plan —
               post-shuffle, post-window, on derived columns — are NOT
               flagged: they cannot reach a scan by construction and
               drowned the signal when any Filter anywhere tripped the
               old heuristic (78/140 false flags in r6). Time
               predicates push on the current testdata layout
               (timestamp[us] NTZ; Spark unwraps the NTZ->TIMESTAMP
               cast and rewrites to_date(col) <= d comparisons onto
               the scan attribute — verified: tpch_pricing_summary
               shows PushedFilters [LessThan(l_shipdate, ...)]); the
               nanos-era caveat that used to live here no longer
               applies, though sources/tables.py still reads the
               legacy INT64-nanos layout correctly.
  PYTHON     — Python in the plan (pandas UDF / mapInPandas stages)

Usage: python scripts/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from falcon_metrics_etl_spark.plans.registry import all_queries
from falcon_metrics_etl_spark.session import get_spark

# brute-force-by-design queries where a nested-loop/cartesian join IS
# the documented algorithm (each has an LSH/bucketed scale-path twin)
CARTESIAN_OK = {
    "knn_brute_cosine",
    # same broadcast non-equi (vec_id != query_id) scoring join as
    # knn_brute_cosine, applied to the base + delta branches
    "knn_incremental_update",
    # 1x1x1 scalar crossJoins combining three single-row stage counts
    "funnel_conversion",
    # N x K broadcast centroid assignment (K<=16 rows broadcast; the
    # deliberate IVF coarse-quantization / Lloyd-assignment map,
    # ann_ivf.py:21-24)
    "ann_ivf_probed",
    # same K-row broadcast centroid assignment, delta slice only (r11)
    "ann_ivf_incremental",
    "kmeans_lloyd_step",
    # N x K broadcast centroid assignment (K=16 rows) + the same
    # pattern as ann_ivf_probed, for the cluster-scoped dedup
    "semdedup_prune",
    # 1 x N broadcast of the single-row corpus stats (N, avgdl, df)
    "bm25_topk",
    # 1 x N broadcast of the single-row weight-sum scalar
    "domain_mix_token_budget",
    # 1 x N broadcast of the single-row sorted merge array onto the
    # distinct-word dictionary (the centroid pattern; plans/bpe.py)
    "bpe_encode_stats",
    # same 1-row broadcast merge-array crossJoin as bpe_encode_stats,
    # byte-level alphabet (r9)
    "bpe_byte_encode_stats",
    # same 1-row broadcast vocabulary-array crossJoin onto the
    # distinct-word dictionary (r11 unigram-LM encoder + its packing
    # composition)
    "ulm_encode_stats",
    "ulm_sequence_packing",
    # 1-row broadcast per-dim absmax crossJoin (r9 SQ8 quantization —
    # the centroid pattern)
    "embedding_int8_stats",
    # 1-row broadcast Bloom-bitmap crossJoin (r9 membership sketch)
    "bloom_contamination_probe",
    # absmax-row + query-side broadcasts (r9 SQ8 recall measurement)
    "ann_int8_recall",
    "bpe_sequence_packing",
    # 1 x N broadcast of the single-row quantized-weight-sum scalar
    "domain_temperature_mix",
    # 1 x N broadcast of the single-row (N, V) corpus-stats scalar
    "unigram_surprisal_scores",
    # same single-row stats broadcast, bigram variant (r7)
    "bigram_surprisal_scores",
    # non-equi (g < g) pairing of the per-group estimates — at most
    # |groups| rows on either side (5 event types), broadcast NLJ
    "kmv_set_ops_pairs",
    # 3-row quantile spec broadcast against the per-group histogram
    "histogram_quantiles_price",
    # 1-row node-count scalar broadcast into the rank initialization
    "pagerank_purchase_graph",
    # 0-or-1-row portfolio-context gate broadcast against the <=25-row
    # scrum-board dim (contexts x boards config synthesis)
    "sprint_bridge",
    # 1-row min/max bounds scalar broadcast into the bucketing, plus
    # the <=1024-row bucket-count prefix-sum self-join of the
    # two-phase NTILE (bounded by bucket cardinality, not data)
    "zorder_locality_stats",
}


# scan-adjacent filters that CANNOT push by nature, audited one by one
# (r7): either the predicate is on a computed value with no source-column
# equivalent, or it is a Catalyst-inferred join-key IsNotNull on a
# derived key (cast/arithmetic of a never-null source column — zero
# row-groups would be skipped even if it pushed)
NOPUSH_OK = {
    # min-token-count gates on size(split(text)) — token counts have no
    # source-column equivalent; the scan still prunes to (doc_id, text)
    "chunk_dedup_rebuild",
    "contamination_ngram_overlap",
    "bloom_contamination_probe",  # same shingle pipeline (r9)
    "ngram_jaccard_pairs",
    "repetition_quality_flags",
    "substring_dedup_windows",
    "substring_dedup_spans",
    "substring_dedup_scrub",
    # same gate on the labeled O(N^2) baseline's probe side
    "embedding_near_dup_pairs",
    # min-token gate (>=2, for bigram features) on the classifier scan
    "quality_classifier_scores",
    "quality_classifier_scores_fast",
    # Catalyst-inferred IsNotNull(cast(pk as string)) join-key guards on
    # derived keys; the source pk columns are non-null by construction
    "kanbanize_card_states",
    "snapshot_derivation",
    "sprint_bridge",
}


def _filter_above_unpushed_scan(plan: str) -> bool:
    """Structural NOPUSH check: a Filter operator whose subtree
    reaches a parquet scan with empty PushedFilters within the next
    few plan lines (allowing the ColumnarToRow / InputAdapter /
    Project wrappers Spark prints between them). Filters deeper in
    the plan (post-shuffle/window/join) are ignored — they cannot
    push by construction."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if not re.search(r"\bFilter\b", line) or "Scan" in line:
            continue
        for nxt in lines[i + 1 : i + 5]:
            if re.search(
                r"\b(Exchange|Join|Window|Aggregate|Generate|Union"
                r"|MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas)\b",
                nxt,
            ):
                break  # a real operator intervenes: not scan-adjacent
            if "Scan parquet" in nxt:
                if "PushedFilters: []" in nxt:
                    return True
                break
    return False


def audit(name: str, plan: str) -> str:
    shuffles = len(re.findall(r"\bExchange\b", plan))
    bcast = len(re.findall(r"BroadcastHashJoin", plan))
    smj = len(re.findall(r"SortMergeJoin", plan))
    # codegen spans appear as "*(n) Op" in executedPlan().toString()
    codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
    scans = len(re.findall(r"Scan parquet", plan))
    pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))

    flags = []
    if re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan):
        flags.append("CARTESIAN" + ("(ok)" if name in CARTESIAN_OK else "!!"))
    if scans and _filter_above_unpushed_scan(plan):
        flags.append("NOPUSH" + ("(ok)" if name in NOPUSH_OK else "!!"))
    if re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan):
        flags.append("PYTHON")
    return (
        f"{name:32s} shuffles={shuffles:2d} bcast={bcast} smj={smj} "
        f"codegen={codegen:2d} scans={scans}({pushed} pushed) "
        f"{' '.join(flags)}"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("plan-audit")
    bad = 0
    for name, q in sorted(all_queries().items()):
        if only and name not in only:
            continue
        df = q.spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        line = audit(name, plan)
        print(line)
        if "!!" in line:
            bad += 1
    print(f"\n{bad} plans with unexpected cartesian joins or unpushed "
          "scan-adjacent filters")
    spark.stop()


if __name__ == "__main__":
    main()
