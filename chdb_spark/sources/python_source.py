"""Custom Python readers as first-class Spark data sources.

The reference exposes ``chdb.PyReader`` (chdb/__init__.py:222): a user class
with a schema and a ``read(col_names, count)`` chunk method, surfaced to SQL
through the ``Python()`` table function (cc_extension.py:1-17). The
Spark-native equivalent is the Spark 4 **Python Data Source API**
(pyspark.sql.datasource): the reader runs INSIDE executors, partitioned,
with Arrow-batched hand-off — not a driver-side materialization.

Two entry points:

* ``PyReader`` — subclass with ``schema()`` + ``read(partition_index,
  n_partitions)`` yielding tuples; plug into ``register_py_reader``.
* ``from_py_reader(spark, reader_cls, n_partitions)`` — one-shot DataFrame.

Design note (100 TB posture): ``n_partitions`` shards the generator across
executors; each partition re-instantiates the reader with its index, so a
reader backed by a sharded external system (object-store listing, DB range
scan) parallelizes naturally. A reader that cannot shard declares
``n_partitions=1`` and is the explicit single-stream case.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class PyReader:
    """User contract mirroring chdb.PyReader (chdb/__init__.py:222).

    Subclasses implement ``schema()`` (DDL string or StructType) and
    ``read(partition_index, n_partitions)`` yielding row tuples for that
    shard. Stateless across partitions — each executor task constructs its
    own instance.
    """

    def schema(self) -> str | StructType:
        raise NotImplementedError

    def read(self, partition_index: int, n_partitions: int) -> Iterator[tuple]:
        raise NotImplementedError


class _PyReaderPartition(InputPartition):
    def __init__(self, index: int, total: int):
        self.index = index
        self.total = total


def _encode_cls(reader_cls: type[PyReader]) -> str:
    import base64

    from pyspark import cloudpickle

    return base64.b64encode(cloudpickle.dumps(reader_cls)).decode("ascii")


def _decode_cls(blob: str) -> type[PyReader]:
    import base64

    from pyspark import cloudpickle

    return cloudpickle.loads(base64.b64decode(blob))


class _PyReaderSource(DataSource):
    """Spark-side adapter. The reader CLASS travels inside the options as a
    cloudpickle blob — the data source is instantiated in a separate Python
    worker where no registry dict would survive, so the source must be
    self-contained."""

    @classmethod
    def name(cls) -> str:
        return "py_reader"

    def schema(self):
        return _decode_cls(self.options["reader_pickle"])().schema()

    def reader(self, schema: StructType) -> DataSourceReader:
        reader_cls = _decode_cls(self.options["reader_pickle"])
        n = int(self.options.get("partitions", "1"))
        return _PyReaderReader(reader_cls, n)


class _PyReaderReader(DataSourceReader):
    def __init__(self, reader_cls: type[PyReader], n_partitions: int):
        self._cls = reader_cls
        self._n = n_partitions

    def partitions(self) -> Sequence[InputPartition]:
        return [_PyReaderPartition(i, self._n) for i in range(self._n)]

    def read(self, partition: _PyReaderPartition) -> Iterator[tuple]:
        return self._cls().read(partition.index, partition.total)


def register_py_reader(spark: SparkSession) -> None:
    """Register the py_reader format on this session (idempotent)."""
    try:
        spark.dataSource.register(_PyReaderSource)
    except Exception:
        pass  # already registered — Spark keeps one source per name


def from_py_reader(
    spark: SparkSession, name: str, reader_cls: type[PyReader], n_partitions: int = 1
) -> DataFrame:
    """Read a custom Python source as a DataFrame (``name`` labels the read
    for humans; the class itself ships in the plan)."""
    register_py_reader(spark)
    return (
        spark.read.format("py_reader")
        .option("reader", name)
        .option("reader_pickle", _encode_cls(reader_cls))
        .option("partitions", str(n_partitions))
        .load()
    )
