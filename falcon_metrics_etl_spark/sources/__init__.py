from falcon_metrics_etl_spark.sources.tables import load_table, register_views

__all__ = ["load_table", "register_views"]
