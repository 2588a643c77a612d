"""Size-gate pins for the r17 scale-adaptive bucket prunes (verdict
r16 #6): the §2.5 two-phase shapes of the W13 top-k and the KMV
sketch rank engage only above an estimated-input-size threshold, and
BOTH paths must stay row-identical — force each path via the conf and
compare, exactly like the r16 mix gate pin
(tests/test_sampling.py::test_greedy_prefix_two_phase_matches_one_window).
"""

from __future__ import annotations

import pytest

from falcon_metrics_etl_spark.plans.registry import all_queries


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "conf_key,names",
    [
        (
            "spark.falconMetricsEtl.topkBucketPruneMinBytes",
            ["top_orders_per_priority"],
        ),
        (
            "spark.falconMetricsEtl.kmvBucketPruneMinBytes",
            ["kmv_distinct_users", "kmv_set_ops_pairs"],
        ),
        (
            "spark.falconMetricsEtl.recallTopkSplitMinBytes",
            ["ann_int8_recall"],
        ),
    ],
)
def test_bucket_prune_gate_row_identical(spark, sf_smoke, conf_key, names):
    reg = all_queries()
    conf = spark.conf
    old = conf.get(conf_key, None)
    try:
        conf.set(conf_key, str(1 << 60))  # exact single-rank path
        exact = {n: _rows(reg[n].spark(spark, sf_smoke)) for n in names}
        conf.set(conf_key, "0")  # bucketed two-phase path
        pruned = {n: _rows(reg[n].spark(spark, sf_smoke)) for n in names}
    finally:
        if old is None:
            conf.unset(conf_key)
        else:
            conf.set(conf_key, old)
    for n in names:
        assert exact[n] == pruned[n], f"{n}: gate paths diverge"
        assert len(exact[n]) > 0


def test_scale_gate_unknown_estimate_is_scale_safe(spark):
    """An unavailable size estimate must select the scale-safe branch
    (True), never raise (r16 advisor: the stats probe is a private
    API that Spark Connect removes)."""
    from falcon_metrics_etl_spark.session import scale_gate

    class _Broken:
        sparkSession = spark

        @property
        def _jdf(self):
            raise RuntimeError("no queryExecution under this API")

    assert scale_gate(_Broken(), "spark.falconMetricsEtl.nope", 1 << 20)
