"""DB-API 2.0 (PEP 249) surface — analogue of ``chdb.dbapi``.

Reference (SURVEY.md §2.11): chDB ships a PyMySQL-derived DB-API driver —
``conn = dbapi.connect(); cur = conn.cursor(); cur.execute(sql);
cur.fetchone()`` with ``description``, ``DictCursor``, and
``get_client_info()`` (reference examples/dbapi.py:1-14).

Spark-first: a Connection wraps the shared SparkSession (the engine is the
JVM, not a per-connection C++ instance), Cursor.execute plans via
``spark.sql`` and materializes through collect(). For big result sets use
``Cursor.stream()`` which yields rows from ``toLocalIterator()`` —
constant driver memory, the same contract as the reference's chunked
``StreamingResult`` (docs/streaming.rst:20-75).

paramstyle is ``format`` (``%s``), matching the reference's
PyMySQL-derived driver; ``pyformat`` (``%(name)s``) also works.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterator, Sequence

from pyspark.sql import SparkSession

apilevel = "2.0"
threadsafety = 1
paramstyle = "format"

_VERSION = "1.0.0-chdb-spark"


# -- PEP 249 exception hierarchy -----------------------------------------
class Warning(Exception):  # noqa: A001 - PEP 249 name
    pass


class Error(Exception):
    pass


class InterfaceError(Error):
    pass


class DatabaseError(Error):
    pass


class DataError(DatabaseError):
    pass


class OperationalError(DatabaseError):
    pass


class IntegrityError(DatabaseError):
    pass


class InternalError(DatabaseError):
    pass


class ProgrammingError(DatabaseError):
    pass


class NotSupportedError(DatabaseError):
    pass


# -- type objects (PEP 249 §Type Objects) --------------------------------
class _DBAPIType(frozenset):
    def __eq__(self, other):  # a type_code equals the group containing it
        if isinstance(other, str):
            return other in self
        return super().__eq__(other)

    def __ne__(self, other):
        return not self.__eq__(other)

    def __hash__(self):
        return super().__hash__()


STRING = _DBAPIType({"string", "varchar", "char"})
BINARY = _DBAPIType({"binary"})
NUMBER = _DBAPIType(
    {
        "tinyint",
        "smallint",
        "int",
        "bigint",
        "float",
        "double",
        "decimal",
        "boolean",
    }
)
DATETIME = _DBAPIType({"timestamp", "timestamp_ntz", "date"})
ROWID = _DBAPIType(set())

Date = _dt.date
Time = _dt.time
Timestamp = _dt.datetime


def DateFromTicks(t):
    return _dt.date.fromtimestamp(t)


def TimeFromTicks(t):
    return _dt.datetime.fromtimestamp(t).time()


def TimestampFromTicks(t):
    return _dt.datetime.fromtimestamp(t)


def Binary(b):
    return bytes(b)


def get_client_info() -> str:
    """Driver version string (reference examples/dbapi.py:5)."""
    return _VERSION


# -- literal escaping ----------------------------------------------------
def escape_item(v: Any) -> str:
    """Render one Python value as a SQL literal."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, (bytes, bytearray)):
        return "X'" + v.hex() + "'"
    if isinstance(v, (list, tuple)):
        return "ARRAY(" + ", ".join(escape_item(x) for x in v) + ")"
    s = str(v).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"


def _interpolate(sql: str, args) -> str:
    if args is None:
        return sql
    if isinstance(args, dict):
        # dict args serve both the pyformat %(name)s style and, when the
        # SQL carries ClickHouse {name:Type} placeholders, the reference's
        # typed server-side binding (chdb/__init__.py:153) via params.py
        from chdb_spark.params import _PLACEHOLDER, bind_params

        if _PLACEHOLDER.search(sql):
            return bind_params(sql, args)
        return sql % {k: escape_item(v) for k, v in args.items()}
    if isinstance(args, (list, tuple)):
        return sql % tuple(escape_item(v) for v in args)
    return sql % (escape_item(args),)


class Cursor:
    """PEP 249 cursor over ``spark.sql``."""

    arraysize = 1

    def __init__(self, connection: "Connection"):
        self.connection = connection
        self._rows: list[tuple] | None = None
        self._idx = 0
        self.description: list[tuple] | None = None
        self.rowcount = -1
        self._closed = False

    # -- helpers ----------------------------------------------------------
    def _check(self):
        if self._closed or self.connection._closed:
            raise InterfaceError("cursor is closed")

    def _set_description(self, df):
        self.description = [
            (f.name, f.dataType.typeName(), None, None, None, None, f.nullable)
            for f in df.schema.fields
        ]

    @staticmethod
    def _convert(row) -> tuple:
        return tuple(row)

    # -- PEP 249 ----------------------------------------------------------
    def _sql(self, text: str):
        """CH-dialect acceptance on the DB-API path too (the reference
        cursor runs ClickHouse SQL — e.g. its own examples use
        ``system.numbers`` and ``toString``)."""
        sess = getattr(self.connection, "_session", None)
        if sess is not None:
            # file-backed connection: execute inside the session's database
            # so cursor DDL persists with the connection path
            return sess.query(text, fmt="DataFrame")
        from chdb_spark.dialect import (
            _TF_RE,
            extract_with_fill,
            resolve_table_functions,
            rewrite,
        )

        text, fill_spec = extract_with_fill(text)
        text = rewrite(text)
        if "__system_" in text:
            from chdb_spark.dialect import resolve_system_tables

            resolve_system_tables(self.connection.spark, text)
        if _TF_RE.search(text):
            text = resolve_table_functions(self.connection.spark, text)
        out = self.connection.spark.sql(text)
        if fill_spec is not None:
            from chdb_spark.session import _apply_with_fill

            out = _apply_with_fill(self.connection.spark, out, fill_spec)
        return out

    def execute(self, operation: str, args=None) -> int:
        self._check()
        sql = _interpolate(operation, args)
        try:
            df = self._sql(sql)
            rows = df.collect()
        except Exception as exc:  # surface as DB-API error classes
            msg = str(exc)
            if "PARSE_SYNTAX_ERROR" in msg or "AnalysisException" in type(exc).__name__:
                raise ProgrammingError(msg) from exc
            raise OperationalError(msg) from exc
        self._set_description(df)
        self._rows = [self._convert(r) for r in rows]
        self._idx = 0
        self.rowcount = len(self._rows)
        return self.rowcount

    def executemany(self, operation: str, seq_of_args: Sequence) -> int:
        total = 0
        for args in seq_of_args:
            total += self.execute(operation, args)
        self.rowcount = total
        return total

    def stream(self, operation: str, args=None) -> Iterator[tuple]:
        """Constant-memory row iterator (``toLocalIterator``) — the analogue
        of the reference's ``send_query`` → StreamingResult chunk pull."""
        self._check()
        df = self._sql(_interpolate(operation, args))
        self._set_description(df)
        return (self._convert(r) for r in df.toLocalIterator())

    def fetchone(self):
        self._check()
        if self._rows is None:
            raise ProgrammingError("execute() not called")
        if self._idx >= len(self._rows):
            return None
        row = self._rows[self._idx]
        self._idx += 1
        return row

    def fetchmany(self, size: int | None = None):
        self._check()
        if self._rows is None:
            raise ProgrammingError("execute() not called")
        size = size or self.arraysize
        out = self._rows[self._idx : self._idx + size]
        self._idx += len(out)
        return out

    def fetchall(self):
        self._check()
        if self._rows is None:
            raise ProgrammingError("execute() not called")
        out = self._rows[self._idx :]
        self._idx = len(self._rows)
        return out

    def setinputsizes(self, sizes):  # PEP 249: may be a no-op
        pass

    def setoutputsize(self, size, column=None):
        pass

    def close(self):
        self._closed = True
        self._rows = None

    def __iter__(self):
        while True:
            row = self.fetchone()
            if row is None:
                return
            yield row

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class DictCursor(Cursor):
    """Rows as dicts (reference ``chdb.dbapi.cursors.DictCursor``)."""

    def _convert(self, row) -> dict:  # type: ignore[override]
        return row.asDict(recursive=True)


class Connection:
    """One logical connection; the engine is the shared SparkSession."""

    def __init__(
        self,
        sf_dir: str | None = None,
        spark: SparkSession | None = None,
        cursorclass: type[Cursor] = Cursor,
        path: str = "",
    ):
        from chdb_spark.session import get_spark, register_tables

        self._session = None
        self._owns_session = True
        if path and path != ":memory:":
            # file-backed connection string (reference chdb.connect("/db"))
            # — DDL/data persist at the path via the stateful Session
            from chdb_spark.stateful import Session as _Session

            self._session = _Session(path)
            self.spark = self._session.spark
        else:
            self.spark = spark or get_spark(app_name="chdb_spark_dbapi")
        if sf_dir:
            register_tables(self.spark, sf_dir)
        self.cursorclass = cursorclass
        self._closed = False

    def cursor(self, cursorclass: type[Cursor] | None = None) -> Cursor:
        if self._closed:
            raise InterfaceError("connection is closed")
        return (cursorclass or self.cursorclass)(self)

    def query(self, sql: str, fmt: str = "CSV", params: dict | None = None):
        """Reference ``Connection.query(sql, fmt)`` convenience
        (chdb/state: ``conn = chdb.connect(); conn.query(sql, "CSV")``) —
        one-shot execution in any output format, typed params bound."""
        if self._closed:
            raise InterfaceError("connection is closed")
        if self._session is not None:
            return self._session.query(sql, fmt=fmt, params=params)
        from chdb_spark.session import query as _query

        return _query(self.spark, sql, fmt, params=params)

    def send_query(self, sql: str, format: str | None = None, **kw):
        """Streaming execution (reference ``conn.send_query`` →
        StreamingResult of chunks; docs/streaming.rst:20-75)."""
        if self._closed:
            raise InterfaceError("connection is closed")
        if self._session is not None:
            return self._session.send_query(sql, format=format, **kw)
        from chdb_spark.session import query as _query
        from chdb_spark.stateful import StreamingResult

        return StreamingResult(_query(self.spark, sql, "DataFrame"), fmt=format, **kw)

    def commit(self):  # autocommit engine — PEP 249 requires the method
        pass

    def rollback(self):
        raise NotSupportedError("chdb_spark is an analytics engine; no transactions")

    def close(self):
        # The SparkSession is shared process-wide (the reference's engine is
        # per-connection C++ state; ours is the JVM) — closing a connection
        # must not tear down the JVM for other users.
        if self._session is not None and self._owns_session:
            self._session.close()  # file-backed state persists at the path
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def connect(
    sf_dir: str | None = None,
    spark: SparkSession | None = None,
    cursorclass: type[Cursor] = Cursor,
    path: str = "",
) -> Connection:
    """Open a DB-API connection (reference examples/dbapi.py:7)."""
    return Connection(sf_dir=sf_dir, spark=spark, cursorclass=cursorclass, path=path)


def connect_str(conn_str: str = ":memory:") -> Connection:
    """Reference-shape ``chdb.connect(connection_string)`` (chdb/state:
    ``:memory:``, a file path, or either with ``?udf_path=…&…`` options).
    Exported as package-level ``chdb_spark.connect``."""
    base, _, qs = (conn_str or ":memory:").partition("?")
    if base.startswith("file:"):
        base = base[5:]
    opts = dict(
        p.split("=", 1) if "=" in p else (p, "") for p in qs.split("&") if p
    )
    conn = Connection(path="" if base == ":memory:" else base)
    if opts.get("udf_path"):
        from chdb_spark.udf import load_udf_path

        load_udf_path(conn.spark, opts["udf_path"])
    return conn
