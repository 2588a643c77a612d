"""Driver contract for the spark-graft builder (PySpark target).

Thin view over falcon_metrics_etl_spark.plans.registry: every operator
the engine implements registers a (spark_fn, oracle_sql) pair there;
this module exposes them in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from falcon_metrics_etl_spark.plans.registry import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (CFD, SURVEY.md A1) on sf0.001; driver checks rows>0."""
    return all_queries()["cfd"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for each query (omitted => rows-only check)."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
