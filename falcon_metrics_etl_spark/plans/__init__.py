from falcon_metrics_etl_spark.plans.registry import Query, all_queries, register

__all__ = ["Query", "all_queries", "register"]
