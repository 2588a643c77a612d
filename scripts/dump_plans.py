"""Dump .explain("formatted") for named queries to
plans/<round>/<name>_<suffix>.txt (round via $SPARK_GRAFT_PLAN_ROUND,
default r17).

Usage: python scripts/dump_plans.py <suffix> <sf_dir> <query> [query ...]
"""
import os
import sys

sys.path.insert(0, ".")

from falcon_metrics_etl_spark.plans.registry import all_queries
from falcon_metrics_etl_spark.session import get_spark


def main() -> None:
    suffix, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r17"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    # optional conf overrides (e.g. forcing a size-gated path):
    # SPARK_GRAFT_DUMP_CONF="k=v,k=v"
    for kv in filter(None, os.environ.get(
            "SPARK_GRAFT_DUMP_CONF", "").split(",")):
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
    registry = all_queries()
    for name in names:
        df = registry[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", f"{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
