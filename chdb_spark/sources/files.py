"""File / URI / generator sources.

Reference parity map (SURVEY.md §2.1):
  file()/auto-format      table_functions.py:123  → read_auto
  url()                   table_functions.py:208  → read_auto (http/https)
  s3/gcs/azure/hdfs       table_functions.py:316+ → read_auto (scheme passthrough)
  numbers(N)              table_functions.py:995  → numbers → spark.range
  generateRandom          table_functions.py:1051 → generate_random
  Python()/from_df        table_functions.py:1143 → from_pandas (Arrow path)
  from_arrow              core.py:2797            → from_arrow
  MySQL/PostgreSQL/SQLite table_functions.py:570+ → read_jdbc (driver-gated)

Scale posture: every reader returns a lazy DataFrame whose scan benefits
from Catalyst pushdown; multi-file globs parallelize by file split
(`spark.sql.files.maxPartitionBytes` caps split size so 100 TB of parquet
becomes ~800k balanced tasks, not one task per file).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension → Spark format (mirror of the reference's format sniffing,
#: uri_parser.py:56-94 + README.md:35-40 "60+ formats" — the long tail of
#: ClickHouse text formats maps onto Spark's csv/json/text options).
_EXT_FORMAT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
    ".avro": "avro",
    ".txt": "text",
    ".arrow": "arrow",
    ".feather": "arrow",
}

_REMOTE_SCHEMES = ("s3a://", "s3://", "gs://", "abfss://", "wasbs://", "hdfs://")


def infer_format(path: str) -> str:
    base = path.rstrip("/*")
    _, ext = os.path.splitext(base)
    return _EXT_FORMAT.get(ext.lower(), "parquet")


def read_auto(
    spark: SparkSession, uri: str, fmt: str | None = None, **options: Any
) -> DataFrame:
    """URI-dispatched reader: local path, glob, or object-store scheme.

    - local / s3a / gs / abfss / hdfs: handed straight to the DataFrameReader
      (Hadoop FS layer handles the scheme; credentials come from cluster conf)
    - http(s): downloaded to a temp file first (no Hadoop http FS by default),
      mirroring the reference's URL table function semantics
    - format inferred from extension unless given; csv defaults to
      header+inferSchema like the reference's format sniffing
    """
    fmt = fmt or infer_format(uri)
    if uri.startswith(("http://", "https://")):
        import tempfile
        import urllib.request

        suffix = os.path.splitext(uri)[1] or ".dat"
        tmp = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
        with urllib.request.urlopen(uri) as resp:  # noqa: S310 — explicit user-supplied URL
            tmp.write(resp.read())
        tmp.close()
        uri = tmp.name
    if (
        fmt == "parquet"
        and not options
        and not uri.startswith(_REMOTE_SCHEMES)
    ):
        # plain local parquet: the session-catalog path — metadata resolved
        # once per (path, fingerprint) instead of per statement, and
        # TIMESTAMP(NANOS) columns restored consistently (see
        # session.read_table; globs/dirs fall through its uncached branch)
        from chdb_spark.session import read_table

        return read_table(spark, uri)
    if fmt == "iceberg" and not uri.startswith(_REMOTE_SCHEMES):
        # jar-or-fallback: the real SparkCatalog when present, else the
        # jar-light metadata walk (sources/iceberg_py.py — avro manifests
        # read through Spark's own bundled avro classes)
        try:
            spark.sparkContext._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog"
            )
        except Exception:
            from chdb_spark.sources.iceberg_py import read_iceberg_py

            snap = options.pop("snapshotId", None)
            return read_iceberg_py(
                spark, uri, snapshot_id=None if snap is None else int(snap)
            )
    if fmt == "hudi" and not uri.startswith(_REMOTE_SCHEMES):
        # same jar-or-fallback split as delta below: the bundle when the
        # classpath has it, else the pure-Python CoW snapshot reader
        try:
            spark.sparkContext._jvm.java.lang.Class.forName(
                "org.apache.hudi.DefaultSource"
            )
        except Exception:
            from chdb_spark.sources.hudi_py import read_hudi_py

            return read_hudi_py(
                spark, uri, drop_meta=bool(options.pop("dropMeta", False))
            )
    if fmt == "delta" and not uri.startswith(_REMOTE_SCHEMES):
        # jars present → the real DeltaLog client; absent → the
        # pure-Python log replay (sources/delta_py.py) so local Delta
        # tables read without any classpath additions
        try:
            spark.sparkContext._jvm.java.lang.Class.forName(
                "org.apache.spark.sql.delta.DeltaLog"
            )
        except Exception:
            from chdb_spark.sources.delta_py import read_delta_py

            version = options.pop("versionAsOf", None)
            return read_delta_py(
                spark, uri,
                version=None if version is None else int(version),
            )
    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if fmt == "tsv":
        fmt = "csv"
        reader = reader.option("sep", "\t")
    return reader.format(fmt).load(uri)


def numbers(spark: SparkSession, n: int, start: int = 0) -> DataFrame:
    """numbers(N) table function (reference table_functions.py:995) —
    spark.range with the reference's column name."""
    return spark.range(start, start + n).withColumnRenamed("id", "number")


def generate_random(
    spark: SparkSession,
    schema: dict[str, str],
    n: int,
    seed: int = 42,
) -> DataFrame:
    """generateRandom analogue (reference table_functions.py:1051).

    ``schema`` maps column → type in {'int','long','double','normal','string',
    'bool','date'}; deterministic per seed. Generation is distributed:
    spark.range partitions the id space and each column derives from it.
    """
    # accept ClickHouse type names too (the reference's generateRandom takes
    # a CH structure string — 'UInt32', 'Float64', 'DateTime', …)
    ch_alias = {
        "int8": "int", "int16": "int", "int32": "int", "int64": "long",
        "uint8": "int", "uint16": "int", "uint32": "long", "uint64": "long",
        "float32": "double", "float64": "double", "datetime": "date",
        "date32": "date", "boolean": "bool",
    }
    df = spark.range(n)
    for i, (name, typ) in enumerate(schema.items()):
        typ = ch_alias.get(str(typ).lower(), str(typ).lower())
        r = F.rand(seed + i)
        if typ == "int":
            col = (r * 2147483647).cast("int")
        elif typ == "long":
            col = (r * (1 << 62)).cast("long")
        elif typ == "double":
            col = r
        elif typ == "normal":
            col = F.randn(seed + i)
        elif typ == "bool":
            col = r > 0.5
        elif typ == "date":
            col = F.date_add(F.lit("2000-01-01").cast("date"), (r * 10000).cast("int"))
        elif typ == "string":
            col = F.md5(F.concat(F.col("id").cast("string"), F.lit(str(seed + i))))
        else:
            raise ValueError(f"unsupported generateRandom type: {typ}")
        df = df.withColumn(name, col)
    return df.drop("id")


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """Python()/from_df analogue (reference table_functions.py:1143,
    cc_extension.py:1-17 zero-copy) — Arrow-accelerated createDataFrame."""
    return spark.createDataFrame(pdf)


def from_arrow(spark: SparkSession, arrow_table) -> DataFrame:
    """from_arrow (reference core.py:2797). Spark 4 accepts pyarrow tables
    directly; fall back through pandas otherwise."""
    try:
        return spark.createDataFrame(arrow_table)
    except Exception:
        return spark.createDataFrame(arrow_table.to_pandas())


def read_jdbc(
    spark: SparkSession,
    url: str,
    dbtable: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: Any,
) -> DataFrame:
    """JDBC source (MySQL/PostgreSQL/SQLite/ClickHouse — reference
    table_functions.py:570,620,772,808).

    Parallel reads require (partition_column, lower/upper bound): Spark then
    issues num_partitions range-sliced queries instead of one full scan —
    essential against a big remote table. Driver JARs must be on the Spark
    classpath; this container ships none, so calls fail with a clear error.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover — no JDBC drivers in test env
        raise RuntimeError(
            "JDBC read failed — ensure the driver JAR is on spark.jars "
            f"(url={url}): {e}"
        ) from e
