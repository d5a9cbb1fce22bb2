"""clickhouse-connect-style client over the Spark engine.

Reference: chdb registers itself as a clickhouse-connect *backend*
(reference chdb/cc_backend.py:1-31 — ``clickhouse_connect.get_client(
"chdb://memory")`` returns a thin Client whose transport methods run the
embedded engine in-process). clickhouse-connect itself is not installed in
this environment, so this module provides the same client surface
directly: ``get_client("chdb://memory")`` / ``get_client("chdb:///path")``
→ a client whose ``query`` / ``query_df`` / ``query_arrow`` / ``command``
/ ``insert`` / ``insert_df`` / ``raw_query`` calls execute through
:class:`chdb_spark.stateful.Session` (CH dialect accepted end-to-end via
chdb_spark.dialect). If the real ``clickhouse_connect`` package is present
it still works — this client never imports it.

Driver-side glue only: every query stays a lazy Spark plan until the
client's result shape (rows / pandas / Arrow) forces collection, same as
any other format path.
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

#: mirrors the engine version string the dialect's version() returns
SERVER_VERSION = "24.5.1"


class QueryResult:
    """Result shape of clickhouse-connect's ``Client.query``: named tuple
    columns + materialized row tuples (driver.query.QueryResult surface)."""

    def __init__(self, column_names: tuple[str, ...], rows: list[tuple]):
        self.column_names = column_names
        self.result_rows = rows

    @property
    def result_columns(self) -> list[list]:
        return [list(c) for c in zip(*self.result_rows)] if self.result_rows else [
            [] for _ in self.column_names
        ]

    @property
    def row_count(self) -> int:
        return len(self.result_rows)

    @property
    def first_row(self):
        # property, matching clickhouse-connect's QueryResult surface
        return self.result_rows[0] if self.result_rows else None

    @property
    def first_item(self):
        r = self.first_row
        return r[0] if r else None

    def named_results(self):
        for r in self.result_rows:
            yield dict(zip(self.column_names, r))


class StreamContext:
    """clickhouse-connect's with-gated stream wrapper (driver.common.
    StreamContext shape): iterate ONLY inside ``with`` — entering hands
    back the generator, exiting closes the source (which abandons the
    underlying ``toLocalIterator``, cancelling remaining partition
    computation — the early-close contract large-result consumers rely
    on)."""

    def __init__(self, source, gen):
        self.source = source
        self.gen = gen
        self._entered = False

    def __enter__(self):
        self._entered = True
        return self.gen

    def __exit__(self, *exc):
        self._entered = False
        self.source.close()

    def __iter__(self):
        if not self._entered:
            raise RuntimeError(
                "Stream should be used within a context (`with client."
                "query_rows_stream(...) as stream:`)"
            )
        return self.gen


class ChdbSparkClient:
    """The subset of clickhouse-connect's Client contract the reference's
    chdb backend exercises (reference tests/clickhouse_connect/
    test_cc_backend.py): ping/query/query_df/query_arrow/command/
    raw_query/insert/insert_df/close, plus uri/server_version and the
    ``chdb_connection`` escape hatch (here: the underlying Session)."""

    def __init__(self, uri: str, spark=None):
        from chdb_spark.stateful import Session

        self.uri = uri
        path = uri[len("chdb://") :]
        if path in ("", "memory", ":memory:"):
            self._session = Session(spark=spark)
        else:
            self._session = Session(path if path.startswith("/") else "/" + path, spark=spark)
        self.server_version = SERVER_VERSION
        self._closed = False

    # -- clickhouse-connect escape hatch (reference exposes the raw conn) --
    @property
    def chdb_connection(self):
        return self._session

    @property
    def chdb(self) -> "ChdbExtension":
        """chDB-only extension namespace (reference cc_extension.py)."""
        return ChdbExtension(self)

    # -- protocol ----------------------------------------------------------
    def ping(self) -> bool:
        return not self._closed

    def close(self) -> None:
        if not self._closed:
            self._session.close()
            self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- query surface -----------------------------------------------------
    def query(self, sql: str, parameters: dict | None = None, **_) -> QueryResult:
        df = self._session.query(sql, fmt="DataFrame", params=parameters)
        cols = tuple(df.columns)
        rows = [tuple(r) for r in df.collect()]
        return QueryResult(cols, rows)

    def query_df(self, sql: str, parameters: dict | None = None, **_):
        return self._session.query(sql, fmt="Pandas", params=parameters)

    def query_arrow(self, sql: str, parameters: dict | None = None, **_):
        return self._session.query(sql, fmt="ArrowTable", params=parameters)

    def query_np(self, sql: str, parameters: dict | None = None, **_):
        return self.query_df(sql, parameters).to_numpy()

    def raw_query(self, sql: str, parameters: dict | None = None, fmt: str = "CSV", **_):
        out = self._session.query(sql, fmt=fmt, params=parameters)
        return out.encode() if isinstance(out, str) else out

    def command(self, sql: str, parameters: dict | None = None, **_):
        """DDL → summary string; SELECT → scalar for one column, list of
        strings for several (clickhouse-connect's command contract)."""
        df = self._session.query(sql, fmt="DataFrame", params=parameters)
        if df is None or not df.columns:
            return ""
        rows = df.limit(2).collect()
        if not rows:
            return ""
        first = rows[0]
        if len(first) == 1 and len(rows) == 1:
            return first[0]
        return [str(v) for v in first]

    # -- streaming surface (reference cc_backend.py:26-29 et seq.) ---------
    def query_rows_stream(
        self, sql: str, parameters: dict | None = None,
        max_block_size: int = 65536, **_,
    ) -> StreamContext:
        """Row-at-a-time stream: ``with client.query_rows_stream(q) as s:
        for row in s`` — rows are tuples; constant driver memory."""
        sr = self._session.send_query(
            sql, max_rows_per_chunk=max_block_size, params=parameters
        )

        def gen():
            for chunk in sr:
                for row in chunk:
                    yield tuple(row)

        return StreamContext(sr, gen())

    def query_row_block_stream(
        self, sql: str, parameters: dict | None = None,
        max_block_size: int = 65536, **_,
    ) -> StreamContext:
        """Block stream, row-oriented: each item is a list of row tuples."""
        sr = self._session.send_query(
            sql, max_rows_per_chunk=max_block_size, params=parameters
        )

        def gen():
            for chunk in sr:
                yield [tuple(r) for r in chunk]

        return StreamContext(sr, gen())

    def query_column_block_stream(
        self, sql: str, parameters: dict | None = None,
        max_block_size: int = 65536, **_,
    ) -> StreamContext:
        """Block stream, column-oriented: each item is a list of column
        sequences (clickhouse-connect's native block orientation)."""
        sr = self._session.send_query(
            sql, max_rows_per_chunk=max_block_size, params=parameters
        )
        width = len(sr.schema.fields)

        def gen():
            for chunk in sr:
                yield (
                    [list(c) for c in zip(*[tuple(r) for r in chunk])]
                    if chunk
                    else [[] for _ in range(width)]
                )

        return StreamContext(sr, gen())

    def query_arrow_stream(
        self, sql: str, parameters: dict | None = None,
        max_block_size: int = 65536, **_,
    ) -> StreamContext:
        """Arrow RecordBatch stream (reference query_arrow_stream,
        cc_backend.py:937-961)."""
        sr = self._session.send_query(
            sql, max_rows_per_chunk=max_block_size, params=parameters
        )
        reader = sr.record_batch(rows_per_batch=max_block_size)

        def gen():
            yield from reader

        return StreamContext(sr, gen())

    # -- insert surface ----------------------------------------------------
    def insert(
        self,
        table: str,
        data: Sequence[Sequence[Any]],
        column_names: Iterable[str] | None = None,
        **_,
    ) -> None:
        spark = self._session.spark
        cols = list(column_names) if column_names else None
        sdf = spark.createDataFrame([tuple(r) for r in data], schema=cols)
        self._insert_df_ordered(table, sdf)

    def insert_df(self, table: str, df, **_) -> None:
        spark = self._session.spark
        self._insert_df_ordered(table, spark.createDataFrame(df))

    def _insert_df_ordered(self, table: str, sdf) -> None:
        # align by NAME to the target schema (reference reorders df columns)
        prev = self._session.spark.catalog.currentDatabase()
        self._session.spark.catalog.setCurrentDatabase(self._session.db)
        try:
            target = self._session.spark.table(table)
            aligned = sdf.select(
                *[sdf[c].cast(f.dataType).alias(c) for c, f in zip(
                    [f.name for f in target.schema.fields], target.schema.fields
                )]
            )
            aligned.write.insertInto(table)
        finally:
            self._session.spark.catalog.setCurrentDatabase(prev)


class ChdbExtension:
    """chDB-only API surface behind ``client.chdb`` (reference
    cc_extension.py:1-126: Python() frames, UDF registration, the DB-API
    cursor, and the session path live in a namespace that exists only on a
    chdb client — never bolted onto the shared Client interface)."""

    def __init__(self, client: "ChdbSparkClient"):
        self._client = client

    @property
    def session_path(self) -> str:
        return self._client._session.path

    @property
    def connection(self):
        """The underlying DB-API connection (shared with the client — its
        close() does not tear down the client's session)."""
        from chdb_spark import dbapi

        conn = dbapi.Connection(spark=self._client._session.spark)
        conn._session = self._client._session
        conn._owns_session = False
        return conn

    def cursor(self):
        return self.connection.cursor()

    def query_python(self, sql: str, fmt: str = "DataFrame", **frames):
        """Run SQL referencing in-memory frames through the ``Python()``
        table function: ``client.chdb.query_python("SELECT sum(a) FROM
        Python(my_df)", my_df=df)`` (reference cc_extension.py:59-102 —
        the reference publishes frames into module globals; here they bind
        directly as the resolution namespace, no global state)."""
        from chdb_spark.dialect import (
            _TF_RE,
            extract_settings,
            resolve_table_functions,
            rewrite,
        )
        from chdb_spark.formats import format_result

        spark = self._client._session.spark
        sql, settings = extract_settings(sql)
        sql = rewrite(sql)
        if _TF_RE.search(sql):
            sql = resolve_table_functions(spark, sql, namespace=dict(frames))
        out = spark.sql(sql)
        if fmt in ("DataFrame", "dataframe"):
            return out.toPandas()  # reference returns pandas for query_python
        return format_result(out, fmt, settings=settings)

    def register_function(self, func=None, *, return_type: str = "String"):
        """Register a Python UDF on this client's session
        (reference cc_extension.py:104-125): usable bare or with kwargs —

        >>> @client.chdb.register_function(return_type="UInt64")
        ... def plus_one(x): return int(x) + 1
        """
        from chdb_spark.udf import chdb_udf, create_function

        def _wrap(fn):
            udf_obj = chdb_udf(return_type=return_type)(fn)
            create_function(self._client._session.spark, udf_obj)
            return udf_obj

        return _wrap(func) if func is not None else _wrap


def get_client(dsn: str, spark=None, **_) -> ChdbSparkClient:
    """``get_client("chdb://memory")`` / ``get_client("chdb:///tmp/x.db")``
    (reference cc_backend.py DSN shapes). Non-chdb DSNs are rejected —
    real ClickHouse servers are clickhouse-connect's own job."""
    if not dsn.startswith("chdb://"):
        raise ValueError(f"get_client: expected a chdb:// DSN, got {dsn!r}")
    return ChdbSparkClient(dsn, spark=spark)
