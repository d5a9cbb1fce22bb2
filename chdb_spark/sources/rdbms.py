"""MySQL / PostgreSQL table functions over the Spark Python Data Source API.

Reference surface: ``mysql('host:port', 'db', 'table', 'user', 'password')``
and ``postgresql(...)`` table functions (reference
datastore/table_functions.py:570,620; core.py:2430 family). The JDBC route
(`sources/files.py read_jdbc`) needs driver jars this container lacks; this
module is the pure-Python executable path — a Spark 4 Python data source
over any DB-API client (pymysql / psycopg2), the same shape as the SQLite
source (`sources/sqlite.py`) and the fake-client-tested NoSQL sources
(`sources/nosql.py`).

Scale design:
* Partition planning: when an integer ``partition_col`` is given (or a
  probe finds an integer primary-key-ish column), the driver runs ONE
  bounds query (``SELECT min(c), max(c)``) and cuts [lo, hi] into
  ``n_partitions`` ranges — each executor task opens its own connection
  and reads one ``WHERE c >= lo AND c < hi`` slice (the same strategy as
  Spark's JDBC partitioning options). Without a partition column the scan
  is one task, explicitly.
* Schema: a declared CH ``structure`` string wins; otherwise the driver
  probes ``LIMIT 100`` rows and infers ClickHouse types via
  ``chdb_spark.utils.infer_data_types`` (the reference introspects
  server-side DDL; a bounded probe is the client-agnostic equivalent).
* The client connects INSIDE executor tasks; only the bounds/probe queries
  run on the driver. The connect FACTORY travels cloudpickled in the
  options, so tests inject dict-backed fakes and drive the full
  executor-side path — with real servers the default factories import the
  real clients and raise a clear ImportError when absent.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from chdb_spark.sources.nosql import (
    _coerce,
    _decode_obj,
    _encode_obj,
    structure_to_ddl,
)

_CH_FROM_PY = {"UInt64": "bigint", "Int64": "bigint", "Float64": "double",
               "String": "string", "Bool": "boolean", "Date": "date",
               "DateTime": "timestamp"}


def _default_mysql_factory(host: str, database: str, user: str, password: str):
    def connect():
        try:
            import pymysql
        except ImportError as e:  # pragma: no cover - client absent here
            raise ImportError(
                "mysql() needs the pymysql client (pip install pymysql)"
            ) from e
        h, _, port = host.partition(":")
        return pymysql.connect(
            host=h, port=int(port or 3306), database=database,
            user=user, password=password,
        )

    return connect


def _default_postgres_factory(host: str, database: str, user: str, password: str):
    def connect():
        try:
            import psycopg2
        except ImportError as e:  # pragma: no cover - client absent here
            raise ImportError(
                "postgresql() needs psycopg2 (pip install psycopg2-binary)"
            ) from e
        h, _, port = host.partition(":")
        return psycopg2.connect(
            host=h, port=int(port or 5432), dbname=database,
            user=user, password=password,
        )

    return connect


class _SqlRangePartition(InputPartition):
    def __init__(self, lo, hi):
        self.lo = lo
        self.hi = hi


class _SqlTableReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self):
        import json

        ranges = json.loads(self.options.get("ranges") or "[[null, null]]")
        return [_SqlRangePartition(lo, hi) for lo, hi in ranges]

    def read(self, partition) -> Iterator[tuple]:
        import json

        factory = _decode_obj(self.options["factory"])
        cols = json.loads(self.options["cols"])       # [(name, spark_type)]
        table = self.options["table"]
        pcol = self.options.get("partition_col") or ""
        conn = factory()
        try:
            cur = conn.cursor()
            sel = ", ".join(c for c, _ in cols)
            sql = f"SELECT {sel} FROM {table}"
            if pcol and (partition.lo is not None or partition.hi is not None):
                conds = []
                if partition.lo is not None:
                    conds.append(f"{pcol} >= {int(partition.lo)}")
                if partition.hi is not None:
                    conds.append(f"{pcol} < {int(partition.hi)}")
                sql += " WHERE " + " AND ".join(conds)
            cur.execute(sql)
            while True:
                rows = cur.fetchmany(10000)
                if not rows:
                    break
                for r in rows:
                    yield tuple(_coerce(v, t) for v, (_, t) in zip(r, cols))
        finally:
            conn.close()


class _SqlTableSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chdb_sqltable"

    def schema(self):
        return self.options["ddl"]

    def reader(self, schema):
        return _SqlTableReader(dict(self.options))


def _plan_ranges(conn, table: str, pcol: str, n_partitions: int) -> list[list]:
    """One driver-side bounds query → n half-open integer ranges."""
    if not pcol or n_partitions <= 1:
        return [[None, None]]
    cur = conn.cursor()
    cur.execute(f"SELECT min({pcol}), max({pcol}) FROM {table}")
    lo, hi = cur.fetchone()
    if lo is None or hi is None or hi <= lo:
        return [[None, None]]
    lo, hi = int(lo), int(hi) + 1
    step = max(1, (hi - lo) // n_partitions)
    bounds = list(range(lo, hi, step))
    ranges = [[b, b + step] for b in bounds]
    ranges[0][0] = None
    ranges[-1][1] = None
    return ranges


def _probe_schema(conn, table: str) -> list[tuple[str, str]]:
    """Bounded LIMIT-100 probe → [(name, spark_type)] via type inference."""
    from chdb_spark.utils import infer_data_type

    cur = conn.cursor()
    cur.execute(f"SELECT * FROM {table} LIMIT 100")
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    out = []
    for i, name in enumerate(names):
        ch = infer_data_type([r[i] for r in rows])
        out.append((name, _CH_FROM_PY.get(ch, "string")))
    return out


def _read_sql_table(
    spark: SparkSession,
    factory,
    table: str,
    structure: str | None = None,
    partition_col: str | None = None,
    n_partitions: int = 8,
) -> DataFrame:
    import json

    conn = factory()
    try:
        if structure:
            ddl = structure_to_ddl(structure)
            cols = [
                (p.strip().split(" ")[0], p.strip().split(" ", 1)[1].strip())
                for p in ddl.split(",")
            ]
        else:
            cols = _probe_schema(conn, table)
            ddl = ", ".join(f"{n} {t}" for n, t in cols)
        if partition_col is None:
            ints = [n for n, t in cols if t in ("bigint", "int")]
            partition_col = ints[0] if ints else ""
        ranges = _plan_ranges(conn, table, partition_col, n_partitions)
    finally:
        conn.close()
    try:
        spark.dataSource.register(_SqlTableSource)
    except Exception:
        pass  # already registered
    return (
        spark.read.format("chdb_sqltable")
        .option("ddl", ddl)
        .option("cols", json.dumps(cols))
        .option("table", table)
        .option("partition_col", partition_col or "")
        .option("ranges", json.dumps(ranges))
        .option("factory", _encode_obj(factory))
        .load()
    )


def mysql(
    spark: SparkSession,
    host: str,
    database: str,
    table: str,
    user: str = "",
    password: str = "",
    structure: str | None = None,
    partition_col: str | None = None,
    n_partitions: int = 8,
    factory=None,
) -> DataFrame:
    """``mysql('host:port', 'db', 'table', 'user', 'password')`` — pure-
    Python executable path (reference table_functions.py:570)."""
    factory = factory or _default_mysql_factory(host, database, user, password)
    return _read_sql_table(
        spark, factory, table, structure, partition_col, n_partitions
    )


def postgresql(
    spark: SparkSession,
    host: str,
    database: str,
    table: str,
    user: str = "",
    password: str = "",
    structure: str | None = None,
    partition_col: str | None = None,
    n_partitions: int = 8,
    factory=None,
) -> DataFrame:
    """``postgresql('host:port', 'db', 'table', 'user', 'password')`` —
    pure-Python executable path (reference table_functions.py:620)."""
    factory = factory or _default_postgres_factory(host, database, user, password)
    return _read_sql_table(
        spark, factory, table, structure, partition_col, n_partitions
    )


def fake_sql_connection_factory(tables: dict[str, tuple[list[str], list[tuple]]]):
    """Deterministic in-process stand-in for a DB-API connection — no
    MySQL/PostgreSQL server in this container, so tests and the my1/pg1
    oracle fixtures inject this as ``factory``; ONLY the wire hop is
    faked. It answers exactly the queries the source issues (bounds probe,
    schema probe, range-sliced SELECT), so partition planning and
    executor-side reads run the real parse/slice path.

    ``tables``: name -> (column names, row tuples).
    """

    def connect():
        import re

        class Cursor:
            def __init__(self):
                self._rows = []
                self.description = None

            def execute(self, sql):
                m = re.match(r"SELECT min\((\w+)\), max\((\w+)\) FROM (\w+)", sql)
                if m:
                    col, _, tbl = m.groups()
                    cols, rows = tables[tbl]
                    i = cols.index(col)
                    vals = [r[i] for r in rows]
                    self._rows = [(min(vals), max(vals))]
                    self.description = [(col,), (col,)]
                    return
                m = re.match(
                    r"SELECT (.+?) FROM (\w+)(?: WHERE (.+?))?(?: LIMIT (\d+))?$",
                    sql,
                )
                assert m, sql
                sel, tbl, where, limit = m.groups()
                cols, rows = tables[tbl]
                if where:
                    for cond in where.split(" AND "):
                        name, op, val = cond.split(" ")
                        i = cols.index(name)
                        rows = [
                            r
                            for r in rows
                            if (r[i] >= int(val) if op == ">=" else r[i] < int(val))
                        ]
                if sel.strip() == "*":
                    idx = list(range(len(cols)))
                    self.description = [(c,) for c in cols]
                else:
                    names = [c.strip() for c in sel.split(",")]
                    idx = [cols.index(n) for n in names]
                    self.description = [(n,) for n in names]
                out = [tuple(r[i] for i in idx) for r in rows]
                if limit:
                    out = out[: int(limit)]
                self._rows = out

            def fetchone(self):
                return self._rows[0]

            def fetchall(self):
                return list(self._rows)

            def fetchmany(self, n):
                out, self._rows = self._rows[:n], self._rows[n:]
                return out

        class Conn:
            def cursor(self):
                return Cursor()

            def close(self):
                pass

        return Conn()

    return connect
