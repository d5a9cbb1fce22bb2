"""Table-function objects + metadata adapters (reference datastore/
table_functions.py:1197-1260, adapters.py:53-330).

The reference exposes ``create_table_function('file', path=..., ...)``
returning an object whose ``to_sql()`` renders the ClickHouse
table-function text, and ``get_adapter(...)`` for remote metadata
discovery. Here the same factory returns objects that render the
IDENTICAL SQL text (executable through this engine's CH-dialect layer,
``session.query("SELECT * FROM " + tf.to_sql())``) and additionally
``.read(spark)`` — a direct dispatch to the Spark-native sources, which
is the distributed path (range-partitioned readers, no driver row
funnel).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from chdb_spark.exceptions import DataStoreError


def _q(v) -> str:
    """Single-quote a SQL literal argument."""
    return "'" + str(v).replace("'", "\\'") + "'"


@dataclass
class TableFunction:
    """A renderable ClickHouse table function (reference
    table_functions.py base class): ``to_sql()`` → text, ``read()`` →
    Spark DataFrame via the native source dispatch."""

    kind: str
    params: dict = field(default_factory=dict)

    # kind → (function name, ordered arg names, optional arg names)
    _SHAPES = {
        "file": ("file", ["path", "format"], ["structure"]),
        "url": ("url", ["url", "format"], ["structure"]),
        "s3": ("s3", ["url", "access_key_id", "secret_access_key", "format"], ["structure"]),
        "gcs": ("gcs", ["url", "access_key_id", "secret_access_key", "format"], ["structure"]),
        "azure": ("azureBlobStorage", ["connection_string", "container", "path", "format"], []),
        "hdfs": ("hdfs", ["uri", "format"], ["structure"]),
        "mysql": ("mysql", ["host", "database", "table", "user", "password"], []),
        "postgresql": ("postgresql", ["host", "database", "table", "user", "password"], []),
        "mongodb": ("mongodb", ["host", "database", "collection", "user", "password", "structure"], []),
        "redis": ("redis", ["host", "key", "structure"], []),
        "sqlite": ("sqlite", ["database", "table"], []),
        "remote": ("remote", ["host", "database", "table", "user", "password"], []),
        "numbers": ("numbers", ["count"], []),
        "python": ("Python", ["obj"], []),
        "iceberg": ("iceberg", ["url"], []),
        "deltalake": ("deltaLake", ["url"], []),
        "hudi": ("hudi", ["url"], []),
    }

    def to_sql(self) -> str:
        fname, required, optional = self._SHAPES[self.kind]
        if self.kind == "remote" and self.params.get("secure"):
            fname = "remoteSecure"
        if self.kind == "numbers":
            return f"numbers({int(self.params['count'])})"
        if self.kind == "python":
            return f"Python({self.params['obj']})"
        args = []
        for name in required:
            if name in self.params:
                args.append(_q(self.params[name]))
        for name in optional:
            if name in self.params:
                args.append(_q(self.params[name]))
        return f"{fname}({', '.join(args)})"

    def read(self, spark=None):
        """Execute distributed: dispatch to the Spark-native source for
        this kind (NOT a driver-side SQL detour)."""
        from chdb_spark.session import get_spark

        spark = spark or get_spark()
        p = self.params
        fmt = p.get("format")
        fmt_opts: dict = {}
        if fmt:  # CH format names → Spark reader formats (read_auto speaks lowercase)
            fl = fmt.lower()
            fmt = {
                "csvwithnames": "csv", "tabseparated": "tsv",
                "tsvwithnames": "tsv", "jsoneachrow": "json",
            }.get(fl, fl)
            if fmt in ("csv", "tsv"):
                # ClickHouse convention: bare CSV/TSV are HEADERLESS —
                # only the WithNames variants carry a header row
                fmt_opts = {
                    "header": str("withnames" in fl).lower(),
                    "inferSchema": "true",
                }
        if self.kind == "file":
            from chdb_spark.sources import read_auto

            return read_auto(spark, p["path"], fmt=fmt, **fmt_opts)
        if self.kind in ("url", "s3", "gcs", "azure", "hdfs"):
            from chdb_spark.sources.uri import open_uri

            return open_uri(spark, p.get("url") or p.get("uri"), fmt=fmt, **fmt_opts)
        if self.kind == "mysql":
            from chdb_spark.sources.rdbms import mysql

            return mysql(spark, p["host"], p["database"], p["table"],
                         p.get("user", "root"), p.get("password", ""),
                         factory=p.get("factory"))
        if self.kind == "postgresql":
            from chdb_spark.sources.rdbms import postgresql

            return postgresql(spark, p["host"], p["database"], p["table"],
                              p.get("user", "postgres"), p.get("password", ""),
                              factory=p.get("factory"))
        if self.kind == "mongodb":
            from chdb_spark.sources.nosql import mongodb

            return mongodb(spark, p["host"], p["database"], p["collection"],
                           p.get("user", ""), p.get("password", ""),
                           structure=p.get("structure"),
                           client_factory=p.get("client_factory"))
        if self.kind == "redis":
            from chdb_spark.sources.nosql import redis_table

            return redis_table(spark, p["host"], p["key"], p["structure"],
                               client_factory=p.get("client_factory"))
        if self.kind == "sqlite":
            from chdb_spark.sources.sqlite import read_sqlite

            return read_sqlite(spark, p["database"], p["table"])
        if self.kind == "remote":
            from chdb_spark.sources.remote_ch import remote

            return remote(spark, p["host"], p["database"], p["table"],
                          user=p.get("user", "default"),
                          password=p.get("password", ""),
                          secure=bool(p.get("secure")),
                          http_factory=p.get("http_factory"))
        if self.kind == "numbers":
            from chdb_spark.sources.files import numbers

            return numbers(spark, int(p["count"]))
        raise DataStoreError(
            f"table function {self.kind!r} has no direct Spark read path "
            "(lakehouse kinds are jar-gated: spark.read.format(...))"
        )


_ALIASES = {
    "http": "url", "https": "url", "azureblob": "azure", "postgres":
    "postgresql", "mongo": "mongodb", "remotesecure": "remote",
    "clickhouse": "remote", "delta": "deltalake",
}


def create_table_function(source_type: str, **params) -> TableFunction:
    """Factory (reference table_functions.py:1227): kind aliases match the
    reference map; ``remotesecure`` implies ``secure=True``."""
    k = source_type.lower()
    kind = _ALIASES.get(k, k)
    if kind not in TableFunction._SHAPES:
        raise DataStoreError(
            f"Unsupported source type: {source_type}. Supported types: "
            f"{', '.join(sorted(set(TableFunction._SHAPES) | set(_ALIASES)))}"
        )
    if k == "remotesecure":
        params.setdefault("secure", True)
    return TableFunction(kind, params)


class SourceAdapter:
    """Metadata discovery for remote databases (reference adapters.py:53):
    renders the listing SQL; when the matching source's client/http factory
    is supplied, executes it too."""

    def __init__(self, host: str, user: str = "default", password: str = "",
                 **kwargs):
        self.host, self.user, self.password = host, user, password
        self.kwargs = kwargs

    def get_table_function_name(self) -> str:
        raise NotImplementedError

    def list_databases_sql(self) -> str:
        raise NotImplementedError

    def list_tables_sql(self, database: str) -> str:
        raise NotImplementedError


class ClickHouseAdapter(SourceAdapter):
    def get_table_function_name(self) -> str:
        return "remoteSecure" if self.kwargs.get("secure") else "remote"

    def list_databases_sql(self) -> str:
        return "SHOW DATABASES"

    def list_tables_sql(self, database: str) -> str:
        return f"SHOW TABLES FROM {database}"

    def _post(self):
        from chdb_spark.sources.remote_ch import _default_http_factory

        factory = self.kwargs.get("http_factory") or _default_http_factory(
            self.host, self.user, self.password,
            self.kwargs.get("secure", False),
        )
        return factory()

    def list_databases(self) -> list[str]:
        from chdb_spark.sources.remote_ch import _tsv_rows

        rows = _tsv_rows(self._post()(self.list_databases_sql() + " FORMAT TSV"))
        return [r[0] for r in rows]

    def list_tables(self, database: str) -> list[str]:
        from chdb_spark.sources.remote_ch import _tsv_rows

        rows = _tsv_rows(
            self._post()(self.list_tables_sql(database) + " FORMAT TSV")
        )
        return [r[0] for r in rows]


class MySQLAdapter(SourceAdapter):
    def get_table_function_name(self) -> str:
        return "mysql"

    def list_databases_sql(self) -> str:
        return "SHOW DATABASES"

    def list_tables_sql(self, database: str) -> str:
        return (
            "SELECT table_name FROM information_schema.tables "
            f"WHERE table_schema = '{database}'"
        )


class PostgreSQLAdapter(SourceAdapter):
    def get_table_function_name(self) -> str:
        return "postgresql"

    def list_databases_sql(self) -> str:
        return "SELECT datname FROM pg_database WHERE datistemplate = false"

    def list_tables_sql(self, database: str) -> str:
        return (
            "SELECT tablename FROM pg_catalog.pg_tables "
            "WHERE schemaname NOT IN ('pg_catalog', 'information_schema')"
        )


ADAPTER_MAP = {
    "clickhouse": ClickHouseAdapter,
    "remote": ClickHouseAdapter,
    "remotesecure": ClickHouseAdapter,
    "mysql": MySQLAdapter,
    "postgresql": PostgreSQLAdapter,
    "postgres": PostgreSQLAdapter,
}


def get_adapter(source_type: str, **params) -> SourceAdapter:
    """reference adapters.py:302 — metadata adapter factory."""
    k = source_type.lower()
    if k not in ADAPTER_MAP:
        raise DataStoreError(
            f"Metadata discovery is not supported for source type: "
            f"{source_type}.\nSupported types: "
            f"{', '.join(sorted(set(ADAPTER_MAP)))}"
        )
    if k == "remotesecure":
        params.setdefault("secure", True)
    return ADAPTER_MAP[k](**params)
