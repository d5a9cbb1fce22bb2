"""Streaming primitives — see package docstring for the capability map."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_result(df: DataFrame, max_rows_per_chunk: int = 65536) -> Iterator:
    """Chunked result iterator — the StreamingResult analogue
    (reference docs/streaming.rst:20-75: fetch() pulls ~65k-row chunks,
    close() cancels early).

    ``toLocalIterator`` streams one partition at a time to the driver —
    constant driver memory regardless of result size; abandoning the
    iterator cancels the remaining partitions' computation.
    """
    buf = []
    for row in df.toLocalIterator(prefetchPartitions=True):
        buf.append(row)
        if len(buf) >= max_rows_per_chunk:
            yield buf
            buf = []
    if buf:
        yield buf


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling/sliding event-time window aggregation with late-data bound.

    Works identically on a batch DataFrame (watermark is a no-op) and a
    readStream DataFrame (watermark bounds state). State is partitioned by
    (window, keys) — at 100 TB/day the state store shards across executors.
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    group_cols = [win] + [F.col(k) for k in (keys or [])]
    out = df.groupBy(*group_cols).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return out.select(
        F.col("window.start").alias("win_start"),
        F.col("window.end").alias("win_end"),
        *[F.col(k) for k in (keys or [])],
        "n_events",
        "sum_value",
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session-window aggregation (F.session_window) — gap-closed sessions
    as a native streaming stateful op; batch DataFrames compute the same
    result without state."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.session_window(ts_col, gap), F.col(key)).agg(
        F.count("*").alias("n_events")
    )
    return out.select(
        F.col("session_window.start").alias("sess_start"),
        F.col("session_window.end").alias("sess_end"),
        F.col(key),
        "n_events",
    )


def materialized_view_stream(
    spark: SparkSession,
    source_path: str,
    transform: Callable[[DataFrame], DataFrame],
    out_path: str,
    checkpoint: str,
    schema=None,
    fmt: str = "parquet",
) -> None:
    """Incremental materialized view: fold NEW source files into ``out_path``.

    The reference's MATERIALIZED VIEW (core.py:5952) re-executes on insert;
    here Structured Streaming's file source + checkpoint tracks which input
    files were already folded, and ``Trigger.AvailableNow`` processes the
    backlog then stops — call again after new data lands to refresh.
    foreachBatch appends the transformed micro-batch.
    """
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    else:
        static = spark.read.format(fmt).load(source_path)
        reader = reader.schema(static.schema)
    stream = reader.format(fmt).load(source_path)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        transform(batch_df).write.mode("append").parquet(out_path)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
