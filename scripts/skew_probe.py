"""Skew-stress probe: rewrite the sf dir with pathological hot keys
(one key owning ~50% of the big table's rows) and compare per-query
wall clock on uniform vs skewed data of the SAME size.

The testdata is uniform, so SCALE.md's salting/AQE claims need a hot
-key witness: this probe manufactures one.

Skew injected:
- lineitem: 50% of rows remapped to ONE l_orderkey (the min key) —
  stresses the salted equi-join (salted_join_orders), the J4-shaped
  items<->revisions shuffle join + per-item windows
  (snapshot_derivation, event_dates_expr), and any groupBy(orderkey);
- events: 50% of rows remapped to ONE event_type ('click') and ONE
  user_id — stresses the two-phase salted holistic aggregation
  (salted_distinct_users) and per-user windows
  (transition_compression);
- documents: 50% of docs' text replaced with ONE boilerplate passage —
  stresses the substring-dedup window key (every boilerplate window is
  now an ultra-hot key: the min-struct hash aggregate must collapse it
  map-side) and the MinHash band buckets.

Every other table is copied unchanged, so queries still resolve dims.
ratio = t_skew / t_uniform: ~1 means the plan absorbs the hot key
(salting spreads it / AQE splits it / per-key state stays bounded);
>> 1 means a reducer is pinned.

Usage: python scripts/skew_probe.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.plans.registry import all_queries
from falcon_metrics_etl_spark.session import get_spark
from falcon_metrics_etl_spark.sources import load_table
from falcon_metrics_etl_spark.sources.tables import TABLES

DEFAULT_QUERIES = [
    "salted_join_orders",
    "salted_distinct_users",
    "snapshot_derivation",  # J4 shape: items<->revisions join + windows
    "event_dates_expr",
    # event_dates_routed is deliberately NOT a default: probing it
    # here MEASURED the whale->mapInPandas routing at 27x the uniform
    # time under the 300k-revision hot item (vs 1.46x for the expr
    # path on the same data) — recorded in SCALE.md; routing now
    # defaults off. Re-probe explicitly if the destination improves.
    "transition_compression",
    "tpch_pricing_summary",
    # boilerplate-heavy corpus: hot window keys must partial-aggregate
    "substring_dedup_windows",
    "substring_dedup_spans",
    "substring_dedup_scrub",
    # r7: the boilerplate tokens/bigrams become ultra-hot LM join keys
    # (the token->count join must absorb them via AQE/broadcast);
    # the classifier is map-only and should be flat — a control
    "bigram_surprisal_scores",
    "quality_classifier_scores",
]


def build_skewed_dir(spark, sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/skew_probe_v2_{tag}"  # v2: documents boilerplate skew
    if os.path.isdir(out) and os.listdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        src = f"{sf_dir.rstrip('/')}/{name}.parquet"
        dst = f"{out}/{name}.parquet"
        if name == "lineitem":
            li = load_table(spark, sf_dir, "lineitem")
            hot = li.agg(F.min("l_orderkey")).collect()[0][0]
            # deterministic 50% remap: half the rows join/group on ONE key
            skew = F.when(
                F.xxhash64("l_orderkey", "l_linenumber") % 2 == 0,
                F.lit(hot),
            ).otherwise(F.col("l_orderkey"))
            li.withColumn("l_orderkey", skew).write.mode("overwrite").parquet(dst)
        elif name == "documents":
            dc = load_table(spark, sf_dir, "documents")
            flip = F.xxhash64("doc_id") % 2 == 0
            boiler = (
                "subscribe to our newsletter for updates terms of "
                "service apply all rights reserved contact us for more "
                "information privacy policy cookie settings follow us"
            )
            dc.withColumn(
                "text",
                F.when(flip, F.lit(boiler)).otherwise(F.col("text")),
            ).withColumn(
                "n_chars",
                F.when(flip, F.lit(len(boiler)).cast("long")).otherwise(F.col("n_chars")),
            ).write.mode("overwrite").parquet(dst)
        elif name == "events":
            ev = load_table(spark, sf_dir, "events")
            flip = F.xxhash64("event_id") % 2 == 0
            ev.withColumn(
                "event_type",
                F.when(flip, F.lit("click")).otherwise(F.col("event_type")),
            ).withColumn(
                "user_id",
                F.when(flip, F.lit(1).cast("long")).otherwise(F.col("user_id")),
            ).write.mode("overwrite").parquet(dst)
        else:
            if os.path.isdir(src):
                shutil.copytree(src, dst, dirs_exist_ok=True)
            else:
                shutil.copy(src, dst)
    return out


def time_query(q, spark, sf_dir: str, repeats: int = 3) -> float:
    # one UNTIMED warmup: the probe always times uniform before skew,
    # and whole-stage codegen / JIT warming of the query shape made
    # the second dir systematically faster — the r9 "0.57 skew
    # witness" on ann_int8_recall was exactly this artifact (its
    # input table is copied UNCHANGED into the skew dir, so any
    # ratio != 1 there is measurement bias by construction)
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(repeats):
        t0 = time.time()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    runs.sort()
    return runs[len(runs) // 2]  # median


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or DEFAULT_QUERIES

    spark = get_spark("skew_probe")
    skew_dir = build_skewed_dir(spark, sf_dir)
    registry = all_queries()

    print(f"# skew probe: {sf_dir} (uniform) vs {skew_dir} (one key = 50%)")
    print(f"{'query':34s} {'t_unif':>7s} {'t_skew':>7s} {'ratio':>6s}")
    for name in names:
        q = registry[name]
        tu = time_query(q, spark, sf_dir)
        tsd = time_query(q, spark, skew_dir)
        print(f"{name:34s} {tu:7.2f} {tsd:7.2f} {tsd / tu:6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
