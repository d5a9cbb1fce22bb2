"""SQLite table function — a real, executable Spark data source over the
stdlib ``sqlite3`` module (no JDBC jar needed).

Reference surface: ``sqlite('path', 'table')`` table function
(datastore/table_functions.py:772) and the SQLite branch of the engine's
DB dispatch (datastore/core.py:2430). The JDBC route (sources/files.py
``read_jdbc``) stays the scale path when a driver jar is present; this
source makes the SQLite surface actually runnable anywhere Python is.

Scale shape: partitioned **rowid range scans** — the driver reads only
``MIN(rowid)/MAX(rowid)``, then each executor task opens its own
connection and scans one ``rowid BETWEEN lo AND hi`` slice (SQLite serves
rowid ranges via the clustered B-tree, so slices don't interfere). That
is the same range-partitioning contract Spark's JDBC source uses
(partitionColumn/lowerBound/upperBound). The database file must be
visible on executors (local mode, NFS, or a cluster-shipped file) — an
inherently single-file format has no parallel-remote story beyond that.

An arbitrary SQL query (instead of a table) runs as one partition — the
explicit single-stream case, same as JDBC's subquery-without-bounds.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: SQLite declared-type affinity → Spark type (SQLite's own affinity rules:
#: INT* → INTEGER, CHAR/CLOB/TEXT → TEXT, BLOB → BLOB, REAL/FLOA/DOUB →
#: REAL, else NUMERIC ~ double)
def _affinity(decl: str | None):
    d = (decl or "").upper()
    if "INT" in d:
        return LongType()
    if any(k in d for k in ("CHAR", "CLOB", "TEXT")):
        return StringType()
    if "BLOB" in d or d == "":
        return BinaryType()
    if any(k in d for k in ("REAL", "FLOA", "DOUB")):
        return DoubleType()
    return DoubleType()


def _is_table_name(s: str) -> bool:
    import re

    return re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", s.strip()) is not None


def infer_sqlite_schema(db_path: str, table_or_query: str) -> StructType:
    """Driver-side schema sniff: PRAGMA table_info for tables (declared
    types), a LIMIT-0 cursor + a one-row value probe for queries."""
    import sqlite3

    con = sqlite3.connect(db_path)
    try:
        if _is_table_name(table_or_query):
            rows = con.execute(f"PRAGMA table_info({table_or_query})").fetchall()
            if not rows:
                raise ValueError(f"sqlite: no such table {table_or_query!r} in {db_path}")
            return StructType(
                [StructField(r[1], _affinity(r[2]), True) for r in rows]
            )
        cur = con.execute(f"SELECT * FROM ({table_or_query}) LIMIT 1")
        names = [d[0] for d in cur.description]
        sample = cur.fetchone()
        fields = []
        for i, name in enumerate(names):
            v = sample[i] if sample else None
            if isinstance(v, int):
                t = LongType()
            elif isinstance(v, float):
                t = DoubleType()
            elif isinstance(v, bytes):
                t = BinaryType()
            else:
                t = StringType()
            fields.append(StructField(name, t, True))
        return StructType(fields)
    finally:
        con.close()


class _SQLitePartition(InputPartition):
    def __init__(self, lo: int | None, hi: int | None):
        self.lo = lo
        self.hi = hi


class _SQLiteSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sqlite"

    def schema(self):
        return infer_sqlite_schema(self.options["path"], self.options["table"])

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SQLiteReader(
            self.options["path"],
            self.options["table"],
            schema,
            int(self.options.get("partitions", "4")),
        )


class _SQLiteReader(DataSourceReader):
    def __init__(self, path: str, table: str, schema: StructType, n: int):
        self._path = path
        self._table = table
        self._schema = schema
        self._n = max(1, n)

    def partitions(self) -> Sequence[InputPartition]:
        import sqlite3

        if not _is_table_name(self._table) or self._n == 1:
            return [_SQLitePartition(None, None)]
        con = sqlite3.connect(self._path)
        try:
            row = con.execute(
                f"SELECT MIN(rowid), MAX(rowid) FROM {self._table}"
            ).fetchone()
        except sqlite3.OperationalError:
            # WITHOUT ROWID tables: no range handle — single stream
            return [_SQLitePartition(None, None)]
        finally:
            con.close()
        lo, hi = row or (None, None)
        if lo is None:
            return [_SQLitePartition(None, None)]
        span = hi - lo + 1
        n = min(self._n, span)
        step = span // n
        parts = []
        for i in range(n):
            a = lo + i * step
            b = hi if i == n - 1 else a + step - 1
            parts.append(_SQLitePartition(a, b))
        return parts

    def read(self, partition: _SQLitePartition) -> Iterator[tuple]:
        import sqlite3

        con = sqlite3.connect(self._path)
        try:
            cols = ", ".join(f'"{f.name}"' for f in self._schema.fields)
            if _is_table_name(self._table):
                sql = f"SELECT {cols} FROM {self._table}"
                args: tuple = ()
                if partition.lo is not None:
                    sql += " WHERE rowid BETWEEN ? AND ?"
                    args = (partition.lo, partition.hi)
            else:
                sql = f"SELECT {cols} FROM ({self._table})"
                args = ()
            want_str = [isinstance(f.dataType, StringType) for f in self._schema.fields]
            want_f = [isinstance(f.dataType, DoubleType) for f in self._schema.fields]
            for row in con.execute(sql, args):
                yield tuple(
                    (
                        None
                        if v is None
                        else str(v) if s else float(v) if f and not isinstance(v, bytes) else v
                    )
                    for v, s, f in zip(row, want_str, want_f)
                )
        finally:
            con.close()


def register_sqlite_source(spark: SparkSession) -> None:
    """Register the ``sqlite`` format on this session (idempotent)."""
    try:
        spark.dataSource.register(_SQLiteSource)
    except Exception:
        pass  # already registered


def read_sqlite(
    spark: SparkSession,
    db_path: str,
    table_or_query: str,
    n_partitions: int = 4,
) -> DataFrame:
    """Read a SQLite table (rowid-partitioned) or SQL query (one stream)
    as a lazy DataFrame — the ``sqlite()`` table function."""
    register_sqlite_source(spark)
    return (
        spark.read.format("sqlite")
        .option("path", db_path)
        .option("table", table_or_query)
        .option("partitions", str(n_partitions))
        .load()
    )
