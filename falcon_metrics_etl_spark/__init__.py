"""falcon_metrics_etl_spark — a PySpark-native flow-metrics analytics engine.

A from-scratch re-expression of the capabilities of
falcon-metrics/falcon-metrics-etl (reference at /root/reference) on
Apache Spark: bronze raw work items -> silver states/snapshots via
workflow event-date derivation -> gold flow metrics, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB lakehouse pipeline needs.

Design principles (SURVEY.md section 7):
- DataFrame/SQL first; Catalyst does pushdown/pruning/join planning.
- Config dims are broadcast; facts are partitioned by (orgId, date).
- The one genuinely procedural operator (event-date extraction) is a
  grouped-map pandas UDF with a narrow input projection.
- Sinks are idempotent keyed MERGEs (emulated on plain parquet).
"""

__version__ = "0.1.0"
