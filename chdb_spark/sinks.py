"""Write-side surface (SURVEY.md §2.2).

Reference parity map:
  to_csv/to_json/to_parquet/to_orc  pandas_compat.py:1970-2173 → write_auto
  create_table / insert_into        core.py:4708,4880          → create_table / insert_into
  VIEW / MATERIALIZED VIEW          core.py:5902,5952          → create_view / create_materialized_view
  output formats (60+)              chdb/__init__.py:145-217   → fmt arg of write_auto / to_pandas / to_arrow

Scale posture: writes go through the DataFrameWriter (distributed, one file
per task); ``partition_by`` maps to hive-style directory partitioning so
downstream scans prune; small-file pressure is controlled by AQE coalescing
rather than a driver-side repartition(1).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

_FORMAT_ALIASES = {"feather": "arrow", "jsonl": "json", "ndjson": "json", "tsv": "csv"}


def write_auto(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: Any,
) -> None:
    fmt = _FORMAT_ALIASES.get(fmt, fmt)
    writer = df.write.mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def to_csv(df: DataFrame, path: str, **options: Any) -> None:
    write_auto(df, path, "csv", **options)


def to_json(df: DataFrame, path: str, **options: Any) -> None:
    write_auto(df, path, "json", **options)


def to_parquet(df: DataFrame, path: str, **options: Any) -> None:
    write_auto(df, path, "parquet", **options)


def to_orc(df: DataFrame, path: str, **options: Any) -> None:
    write_auto(df, path, "orc", **options)


def to_pandas(df: DataFrame):
    """Arrow-batched collect (the reference's query_df zero-copy analogue,
    chdb/__init__.py:204-206). Driver-side — size-check before calling at
    scale; prefer write_auto for big results."""
    return df.toPandas()


def to_arrow(df: DataFrame):
    """Arrow table result (reference to_arrowTable, chdb/__init__.py:107-118)."""
    import pyarrow as pa

    batches = df._collect_as_arrow() if hasattr(df, "_collect_as_arrow") else None
    if batches:
        return pa.Table.from_batches(batches)
    return pa.Table.from_pandas(df.toPandas())


def create_table(
    spark: SparkSession,
    name: str,
    df: DataFrame,
    path: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """CREATE TABLE AS (reference core.py:4708 create_table).

    With ``path``: external parquet table (the Spark analogue of a MergeTree
    data directory); without: managed table under spark.sql.warehouse.dir.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if path:
        writer.option("path", path)
    writer.saveAsTable(name)


def insert_into(spark: SparkSession, name: str, df: DataFrame, overwrite: bool = False) -> None:
    """INSERT INTO existing table (reference core.py:4880 insert_into)."""
    df.write.insertInto(name, overwrite=overwrite)


def create_view(spark: SparkSession, name: str, df: DataFrame) -> None:
    """CREATE VIEW (reference core.py:5902) — lazy, recomputed per query."""
    df.createOrReplaceTempView(name)


def create_materialized_view(
    spark: SparkSession,
    name: str,
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialized view analogue (reference core.py:5952): persist the query
    result as parquet and register a view over the materialization. For the
    insert-triggered incremental form, see
    chdb_spark.streaming.materialized_view_stream (Structured Streaming)."""
    df.write.mode(mode).parquet(path)
    mv = spark.read.parquet(path)
    mv.createOrReplaceTempView(name)
    return mv
