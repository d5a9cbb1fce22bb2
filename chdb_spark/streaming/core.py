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


def state_partitions(spark: SparkSession, n: int):
    """Context manager sizing ``spark.sql.shuffle.partitions`` — and with
    it the number of STATE STORE instances — for a stateful streaming
    query whose key cardinality is known and bounded.

    Every stateful operator materializes one state store per shuffle
    partition, and every micro-batch pays per-instance commit overhead
    (an HDFS-backed delta file each). For a windowed agg whose keys are
    a few hundred (day × event_type grains), 32 instances are pure
    overhead — measured 1.7→1.0 s per run at sf0.1 with 8. Map-side
    partial aggregation still parallelizes across all input splits
    BEFORE the shuffle, so reducer count is about state cardinality, not
    input size — at 100 TB the same knob is sized UP for high-cardinality
    keys (sm6's 1024 LSH shards) and stays small for grain-bounded state.
    The streaming plan captures the value at checkpoint creation; each
    query here builds a fresh checkpoint, so scoping the conf to the
    ``with`` block is exact. Restores the prior value on exit."""
    from contextlib import contextmanager

    @contextmanager
    def _scope():
        prior = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prior)

    return _scope()


def _ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Spark's event-time watermark requires TIMESTAMP (LTZ). Parquet written
    with NTZ/micros timestamps (the driver's testdata since round 2) infers
    TIMESTAMP_NTZ, which ``withWatermark`` rejects. With the session TZ pinned
    to UTC the cast is lossless, so normalize here once for every caller."""
    from pyspark.sql.types import TimestampNTZType

    if ts_col in df.columns and isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


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
    df = _ensure_event_time(events, ts_col)
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
    df = _ensure_event_time(events, ts_col)
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


def read_events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source readStream over the events table — the streaming-ingest
    entry point. Schema is pinned from a static read (file sources require
    it); nanosecond timestamps come back as long via the session's
    nanosAsLong conf, so ts is restored exactly like session.read_table."""
    import os

    from chdb_spark.session import read_table

    path = os.path.join(sf_dir, "events.parquet")
    static = read_table(spark, path)
    raw_schema = spark.read.parquet(path).schema
    # file sources stream DIRECTORIES: point at sf_dir, glob-filter the table
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # restore TimestampType for the nanosAsLong-read ts column; micros parquet
    # infers TIMESTAMP_NTZ, which event-time ops reject — normalize both.
    for f in static.schema.fields:
        if f.name == "ts" and str(stream.schema["ts"].dataType) == "LongType()":
            # INTEGER division to micros (float /1e9 loses precision above
            # 2^53 ns and can flip a microsecond at window boundaries)
            stream = stream.withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)")
            )
    return _ensure_event_time(stream, "ts")


def stateful_running_totals(
    events: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    value: str = "value",
    timeout_minutes: "int | None" = 30,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState — per-key running
    totals that survive across micro-batches (the reference has no streaming
    state at all; this is the Spark-native superset, SURVEY.md §2.9).

    State per key is one (count, total) pair — O(keys) state store, sharded
    across executors by the groupBy hash. Timeout evicts idle keys so state
    is bounded on unbounded key domains. Pass ``timeout_minutes=None`` for
    NoTimeout — required for Trigger.AvailableNow backfills, where a pending
    processing-time timeout makes the MultiBatchExecutor keep scheduling
    empty state-cleanup batches and the query never terminates.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total double"
    state_schema = "n long, total double"

    def update(key_tuple, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf[value].sum())
        state.update((n, total))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        import pandas as pd

        yield pd.DataFrame({"user_id": [key_tuple[0]], "n_events": [n], "total": [total]})

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if timeout_minutes is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )


def streaming_lsh_bucket_pairs(banded: DataFrame, n_shards: int = 1024) -> DataFrame:
    """Stateful streaming LSH candidate discovery: near-dup candidates over
    an UNBOUNDED document stream, without re-scanning the corpus per batch.

    ``banded`` is the streaming (doc_id, band_idx, band_hash) relation
    (``doc_features`` + posexplode — both map-only, streaming-safe).
    Logical state lives per LSH bucket (the doc ids seen in that bucket so
    far); PHYSICAL state is keyed by Flink-style KEY GROUPS — buckets
    hashed into ``n_shards`` shards, each state entry holding its shard's
    (bucket, doc_id) membership as parallel arrays. Grouping by the raw
    bucket key was measured ~5 ms of per-group pandas/state-store overhead
    with ~40k live buckets per batch (7.5 s batches at sf0.1); key-grouping
    amortizes that overhead across ~40 buckets per group (same emitted
    pairs, measured 2.6 s/batch). Each micro-batch pairs a bucket's new
    members against the remembered ones plus each other, so the union of
    all emitted pairs over any arrival order equals the batch self-join's
    candidate set exactly — order-independence is what makes the batch
    oracle apply. Buckets are identified by ``xxhash64(band_idx,
    band_hash)``; a 64-bit bucket collision can only ADD a candidate pair,
    which the downstream exact-Jaccard verify discards.

    Scale shape: ``n_shards`` is the state-parallelism knob — size it to
    ~1e4-1e5 band rows per shard so a state entry stays one task-sized
    array (it bounds per-task state, exactly like choosing shuffle
    partitions). On a true unbounded stream, bound state by evicting
    idle shards past a TTL (swap NoTimeout for ProcessingTimeTimeout —
    expired buckets stop matching older docs, the standard windowed-dedup
    trade); NoTimeout here because AvailableNow backfills never terminate
    with a pending processing-time timeout (measured, see
    stateful_running_totals).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "doc_a long, doc_b long"
    state_schema = "bks array<long>, ids array<long>"

    keyed = banded.select(
        F.xxhash64("band_idx", "band_hash").alias("bucket"),
        "doc_id",
    ).withColumn("shard", F.pmod(F.col("bucket"), F.lit(n_shards)))

    def update(key_tuple, pdf_iter, state):
        import pandas as pd

        seen: dict = {}
        if state.exists:
            bks, ids = state.get
            for b, d in zip(bks, ids):
                seen.setdefault(int(b), []).append(int(d))
        batch: dict = {}
        for pdf in pdf_iter:
            for b, d in zip(pdf["bucket"], pdf["doc_id"]):
                batch.setdefault(int(b), set()).add(int(d))
        pa: list = []
        pb: list = []
        for b, docs in batch.items():
            old = seen.setdefault(b, [])
            new = sorted(docs.difference(old))
            for i, d in enumerate(new):
                for o in old:
                    lo, hi = (o, d) if o < d else (d, o)
                    pa.append(lo)
                    pb.append(hi)
                for d2 in new[i + 1 :]:
                    pa.append(d)
                    pb.append(d2)
            old.extend(new)
        flat_b: list = []
        flat_i: list = []
        for b, ds in seen.items():
            flat_b.extend([b] * len(ds))
            flat_i.extend(ds)
        state.update((flat_b, flat_i))
        yield pd.DataFrame({"doc_a": pa, "doc_b": pb})

    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
