"""chdb_spark.streaming — streaming & incremental surface (SURVEY.md §2.9).

Three capability tiers:
1. Chunked result streaming (the reference's StreamingResult,
   docs/streaming.rst) → ``stream_result`` (Arrow-batched iterator,
   constant memory, early close).
2. Incremental materialized views (reference create_materialized_view,
   core.py:5952) → ``materialized_view_stream`` (Structured Streaming file
   source + availableNow trigger: each invocation incrementally folds NEW
   files into the materialization — the insert-triggered MV analogue).
3. The Spark-native superset the reference lacks: watermarked event-time
   windows and session windows over streams (``windowed_counts``,
   ``session_windows``) — these also run on batch DataFrames, which is how
   the oracle-checked queries exercise them.
"""

from chdb_spark.streaming.core import (
    materialized_view_stream,
    read_events_stream,
    session_windows,
    stateful_running_totals,
    stream_result,
    windowed_counts,
)

__all__ = [
    "stream_result",
    "materialized_view_stream",
    "windowed_counts",
    "session_windows",
    "read_events_stream",
    "stateful_running_totals",
]
