"""chdb_spark.sources — scan-side surface (SURVEY.md §2.1).

The reference reaches every source through ClickHouse table functions with a
URI dispatcher (datastore/uri_parser.py:56-94, table_functions.py). Spark's
DataFrameReader already speaks these protocols; this package provides the
equivalent dispatch + the generator/table-function analogues.
"""

from chdb_spark.sources.files import (
    from_arrow,
    from_pandas,
    generate_random,
    numbers,
    read_auto,
    read_jdbc,
)
from chdb_spark.sources.python_source import PyReader, from_py_reader, register_py_reader
from chdb_spark.sources.sqlite import read_sqlite, register_sqlite_source
from chdb_spark.sources.uri import open_uri

__all__ = [
    "read_auto",
    "numbers",
    "generate_random",
    "from_pandas",
    "from_arrow",
    "read_jdbc",
    "open_uri",
    "PyReader",
    "from_py_reader",
    "register_py_reader",
    "read_sqlite",
    "register_sqlite_source",
]
