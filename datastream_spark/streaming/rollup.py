"""Streaming rollup: the downsample cascade as a continuous query.

Parity target: ``downsample_streams`` (datastream/api.py:~600 [HIGH],
mongodb.py:_downsample ~1200-1400 [MED]) — the reference runs it from
cron, finalizing only buckets strictly before floor(now). Structured
Streaming gives the same contract natively: tumbling ``window()`` +
``withWatermark`` in APPEND output mode emits a bucket exactly once,
only after the watermark passes its end — "no partial buckets ever
visible" (SURVEY.md §2.9) enforced by the engine, and the checkpoint
replaces the registry's ``downsampled_until`` map.

The aggregation expressions are imported from the batch engine
(``operators.rollup.raw_rollup_aggs`` + ``finish_columns``): one
algebraic definition serving both runtimes, so batch/streaming parity
is structural, not aspirational.

Scale notes: streaming aggregation state is keyed (stream_id, window) —
partial aggregation happens map-side per micro-batch, state store holds
one merge-form row per open bucket per stream. With the 7-level ladder,
only the FINEST level consumes raw events; coarser levels chain
stream-over-stream (or run as incremental batch over the level-1 sink,
which is the recommended 100 TB deployment — §7.1 M7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..granularity import Granularity
from ..operators.rollup import finish_columns, raw_rollup_aggs


def streaming_rollup(
    stream: DataFrame,
    granularity: Granularity,
    watermark_delay: str = "30 seconds",
    key: str = "stream_id",
    value: str = "value",
    ts: str = "ts",
) -> DataFrame:
    """Tumbling-window downsample of an unbounded datapoint stream.

    Returns a streaming frame with the same merge-form + finished
    columns as the batch ``rollup_from_raw`` plus the window struct;
    write with ``.writeStream.outputMode("append")`` so only
    watermark-finalized buckets are ever emitted.
    """
    d = granularity.duration_in_seconds()
    agg = (
        stream.withWatermark(ts, watermark_delay)
        .groupBy(F.col(key), F.window(F.col(ts), f"{d} seconds").alias("win"))
        .agg(*raw_rollup_aggs(value, ts))
    )
    return finish_columns(agg).withColumn(
        "bucket_epoch", F.unix_timestamp(F.col("win.start"))
    )


def materialize_rollup_stream(
    stream: DataFrame,
    store_root: str,
    granularity: Granularity,
    checkpoint: str,
    watermark_delay: str = "30 seconds",
):
    """Wire the streaming rollup into the SAME ``rollup_<g>`` table the
    batch engine reads: readStream -> tumbling agg -> append-mode
    parquet sink partitioned by ``p_date``. A continuously-running
    replacement for the cron ``downsample_streams`` worker — batch
    ``get_data``/``scan`` see streaming-finalized buckets with no code
    change, because the sink schema IS the batch rollup schema.

    Returns the ``DataStreamWriter`` (caller picks the trigger:
    ``.trigger(availableNow=True).start()`` for catch-up runs,
    ``.start()`` for continuous). The checkpoint plays the registry's
    ``downsampled_until`` role: exactly-once bucket emission across
    restarts."""
    import os

    rolled = streaming_rollup(
        stream, granularity, watermark_delay=watermark_delay
    )
    out = rolled.drop("win").withColumn(
        "p_date",
        F.to_date(F.timestamp_seconds(F.col("bucket_epoch"))).cast("string"),
    )
    return (
        out.writeStream.format("parquet")
        .option("path", os.path.join(store_root, f"rollup_{granularity.name}"))
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        # same (p_date, stream_id) layout as the batch cascade writers
        # (TableStore) so one partition scheme serves the whole table;
        # a level is fed by the streaming sink OR the batch cascade,
        # never both (the sink's _spark_metadata log governs reads of
        # a streaming-owned table)
        .partitionBy("p_date", "stream_id")
    )


def sliding_rollup_stream(
    stream: DataFrame,
    duration_seconds: int,
    slide_seconds: int,
    watermark_delay: str = "30 seconds",
    key: str = "stream_id",
    value: str = "value",
    ts: str = "ts",
) -> DataFrame:
    """Sliding-window variant (extended surface — the reference ladder
    is tumbling-only, SURVEY.md §2.9 last row)."""
    agg = (
        stream.withWatermark(ts, watermark_delay)
        .groupBy(
            F.col(key),
            F.window(
                F.col(ts), f"{duration_seconds} seconds", f"{slide_seconds} seconds"
            ).alias("win"),
        )
        .agg(*raw_rollup_aggs(value, ts))
    )
    return finish_columns(agg)


def session_rollup_stream(
    stream: DataFrame,
    gap_seconds: int,
    watermark_delay: str = "30 seconds",
    key: str = "stream_id",
    value: str = "value",
    ts: str = "ts",
) -> DataFrame:
    """Session-window aggregation (extended surface; batch twin is
    ``operators.sessionize`` whose island formulation the DuckDB oracle
    runs — Q-ST2)."""
    agg = (
        stream.withWatermark(ts, watermark_delay)
        .groupBy(
            F.col(key),
            F.session_window(F.col(ts), f"{gap_seconds} seconds").alias("win"),
        )
        .agg(*raw_rollup_aggs(value, ts))
    )
    return finish_columns(agg)
