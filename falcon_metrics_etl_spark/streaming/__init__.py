from falcon_metrics_etl_spark.streaming.cursors import (
    CURSOR_KEYS,
    advance_cursor,
    load_cursor,
)
from falcon_metrics_etl_spark.streaming.incremental import run_incremental_batch
from falcon_metrics_etl_spark.streaming.windows import (
    stream_dedupe,
    stream_session_counts,
    stream_sessionize_stateful,
    stream_sessionize_tws,
)
from falcon_metrics_etl_spark.streaming.jobs import (
    foreach_batch_merge,
    stream_windowed_counts,
)

__all__ = [
    "CURSOR_KEYS",
    "load_cursor",
    "advance_cursor",
    "run_incremental_batch",
    "stream_windowed_counts",
    "stream_dedupe",
    "stream_session_counts",
    "stream_sessionize_stateful",
    "stream_sessionize_tws",
    "foreach_batch_merge",
]
