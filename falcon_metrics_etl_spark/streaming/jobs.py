"""Structured Streaming jobs — ST2 / ST7 / ST8.

The reference's SQS/SNS hops are micro-batches with at-least-once
delivery made safe by keyed upserts (SURVEY.md ST2). The canonical
Spark translation is ``readStream -> foreachBatch(MERGE)``: each
micro-batch is merged idempotently, so redelivery/restart converges —
identical to the reference's contract, with the checkpoint dir playing
the role of the SQS ack.

ST7's tumbling metric windows map to ``window(ts, ...)`` aggregation
with a watermark bounding state (the reference itself never needs
watermarks — ST8 — because it recomputes whole items; we add one for
the streaming bench path over `events`).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from falcon_metrics_etl_spark.sinks.merge import merge_upsert


# the driver-generated events table, as a stream source. Testdata has
# carried ts two ways (long nanos under nanosAsLong, or timestamp_ntz);
# mirror the batch reader's dual-format handling by probing the actual
# file schema with a batch read, then declaring the matching stream
# schema and normalizing to session-UTC TimestampType.
_EVENTS_STREAM_SCHEMA_NANOS = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
_EVENTS_STREAM_SCHEMA_NTZ = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.sources.tables import ensure_session_confs

    ensure_session_confs(spark)
    # a streaming source can't introspect the files, so probe the parquet
    # schema via a zero-cost batch read of the same path
    ts_dtype = dict(
        spark.read.parquet(f"{sf_dir}/events.parquet").dtypes
    )["ts"]
    # events.parquet is a single file; the file stream source wants a
    # directory, so stream the sf dir filtered down to that one file
    read = spark.readStream.option("pathGlobFilter", "events.parquet")
    if ts_dtype == "bigint":
        raw = read.schema(_EVENTS_STREAM_SCHEMA_NANOS).parquet(sf_dir)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    raw = read.schema(_EVENTS_STREAM_SCHEMA_NTZ).parquet(sf_dir)
    # wall-clock micros; session tz is UTC so the instant is unchanged
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 day",
    watermark: str = "1 day",
    source: Optional[DataFrame] = None,
) -> DataFrame:
    """ST7: tumbling-window counts per key over a file-stream source.

    Late rows older than the watermark are dropped (bounded state);
    everything stays in built-in streaming aggregation — no
    applyInPandasWithState needed for this shape. Pass ``source`` to
    aggregate an already-built streaming DataFrame (e.g.
    ``stream_events``) instead of a raw schema+dir read.
    """
    stream = (
        source
        if source is not None
        else spark.readStream.schema(schema).parquet(source_dir)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_len).alias("win"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n_events",
        )
    )


def foreach_batch_merge(
    streaming_df: DataFrame,
    sink_path: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    partition_cols: Optional[Sequence[str]] = None,
    available_now: bool = True,
    output_mode: str = "update",
) -> StreamingQuery:
    """ST2: write a stream through idempotent MERGE micro-batches.

    ``availableNow`` drains everything currently available then stops —
    the scheduled-batch mode the reference's 5-minute EventBridge tick
    corresponds to; pass False for a continuous query. ``output_mode``
    defaults to update (keyed aggregations re-merge in place); session
    windows require append (rows emit once the watermark closes them).
    """
    spark = streaming_df.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_upsert(spark, sink_path, batch_df, keys, partition_cols)

    writer = (
        streaming_df.writeStream.foreachBatch(_merge)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
