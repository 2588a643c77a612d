"""Named-query registry.

Every operator the engine claims (SURVEY.md section 2) registers here
as a (spark_fn, oracle_sql) pair. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry; the driver runs
both sides at sf0.01 and hash-compares.

Contract notes:
- spark_fn(spark, sf_dir) -> DataFrame, lazily defined (no actions).
  ONE documented exception: event_dates_routed runs a single
  column-pruned control-plane aggregate at definition time — the
  whale split is decided from data BEFORE the plan exists, by design
  (see extract_event_dates_routed). Tooling that builds every
  registered plan (plan_audit, bench) pays one small job there.
- oracle is ANSI SQL DuckDB can run on the same parquet (views
  pre-registered by the driver). ``None`` => rows-only check (reserved
  for genuinely non-SQL-expressible ops).
- Column names must match exactly between the two sides; aggregates
  are aliased on both.
- Determinism: money sums aggregate via DECIMAL(18,2) then cast to
  DOUBLE (exact, order-insensitive); percentiles use the discrete
  definition (returns actual data points).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQueryFn
    oracle: Optional[str]
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str] = None, doc: str = "", tags: tuple = ()):
    """Decorator: register a named engine query with its DuckDB oracle."""

    def deco(fn: SparkQueryFn) -> SparkQueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import all plan modules (side-effect registration) and return the registry."""
    # local imports to avoid import cycles; each module registers on import
    from falcon_metrics_etl_spark.plans import (  # noqa: F401
        ann_ivf,
        bpe,
        corpus_ops,
        dedup_lsh,
        etl_parity,
        flow_metrics,
        graph,
        kanbanize_queries,
        media_dedup,
        multimodal,
        relational,
        retrieval,
        rollup_queries,
        sampling_queries,
        sprint_queries,
        temporal_joins,
        text_pipeline,
        timeseries,
        ulm,
        workflow_pipeline,
    )

    return dict(_REGISTRY)
