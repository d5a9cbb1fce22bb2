"""chdb_spark — a PySpark-native analytics engine with chDB's capabilities.

This package re-expresses the capability surface of chdb-io/chdb
(an in-process OLAP engine powered by ClickHouse; see SURVEY.md) on top of
Apache Spark: DataFrame / Spark SQL / Catalyst / Structured Streaming.

Top-level API (mirrors the reference's ``chdb.query`` / ``Session`` surface,
reference: chdb/__init__.py:145-217 and docs/session.rst):

    import chdb_spark as cs
    spark = cs.get_spark()                  # tuned SparkSession
    cs.register_tables(spark, "/root/testdata/sf0.01")
    df = cs.query(spark, "SELECT count(*) AS n FROM lineitem")

    conn = cs.connect(":memory:")           # reference connection shape
    conn.query("SELECT 1", "CSV"); conn.cursor().execute("SELECT 2")

Everything here is idiomatic Spark: queries are declared with the DataFrame /
SQL API and Catalyst+Tungsten choose the physical plan. No dual-engine
planner, no SQL segmentation (SURVEY.md §7.8).
"""

from chdb_spark.session import (
    ChdbError,
    databases,
    get_spark,
    read_table,
    register_tables,
    query,
    sql,
    tables,
    use_database,
)
from chdb_spark import functions as F
from chdb_spark import dbapi
from chdb_spark.dbapi import connect_str as connect  # reference chdb.connect shape
from chdb_spark.stateful import Session, StreamingResult
from chdb_spark import durable
from chdb_spark import agents
from chdb_spark import utils
from chdb_spark import state
from chdb_spark.sinks import to_arrow as to_arrowTable  # noqa: N812 (reference name)
from chdb_spark.sinks import to_pandas as to_df
from chdb_spark.udf import (
    ExceptionHandling,
    NullHandling,
    chdb_udf,
    create_function,
    drop_function,
)
from chdb_spark.cc_backend import get_client
from chdb_spark.sources.python_source import PyReader


def to_datastore(df):
    """Wrap a pandas DataFrame in a DataStore (reference chdb/__init__.py:121)."""
    from chdb_spark.datastore import DataStore

    return DataStore(df)


def engine_version() -> str:
    """Engine version string (reference ``engine_version``, chdb/__init__.py:99)."""
    from chdb_spark.cc_backend import SERVER_VERSION

    return SERVER_VERSION


__all__ = [
    "connect",
    "get_spark",
    "read_table",
    "register_tables",
    "query",
    "sql",
    "F",
    "databases",
    "tables",
    "use_database",
    "dbapi",
    "Session",
    "StreamingResult",
    "durable",
    "agents",
    "chdb_udf",
    "create_function",
    "drop_function",
    "NullHandling",
    "ExceptionHandling",
    "to_df",
    "to_arrowTable",
    "to_datastore",
    "ChdbError",
    "PyReader",
    "get_client",
    "chdb_version",
    "engine_version",
]
__version__ = "0.1.0"
#: reference chdb/__init__.py:104 — version as a tuple of components
chdb_version = tuple(__version__.split("."))
