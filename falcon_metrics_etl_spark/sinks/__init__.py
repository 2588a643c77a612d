from falcon_metrics_etl_spark.sinks.merge import (
    merge_upsert,
    upsert_snapshots,
    upsert_states,
)
from falcon_metrics_etl_spark.sinks.maintenance import (
    refresh_bridge,
    soft_delete_missing,
)

__all__ = [
    "merge_upsert",
    "upsert_states",
    "upsert_snapshots",
    "refresh_bridge",
    "soft_delete_missing",
]
