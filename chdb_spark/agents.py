"""Agent-tool surface — the analogue of ``chdb.agents.ChDBTool``
(SURVEY §1.1; reference chdb/agents/__init__.py:1-14, tool.py:111-559,
CONTRACT.md).

Canonical methods (reference CONTRACT.md "Methods" table): run_select_query
(``query``), list_databases, list_tables, describe_table (``describe``),
get_sample_data, list_functions, attach_file — plus ``tool_specs(dialect)``
rendering the model-visible schemas for anthropic / openai / mcp runtimes,
``capabilities()`` probing, and the quote_ident / quote_string safety
helpers (reference safety.py).

Spark-first: queries run through ``spark.sql`` (Catalyst enforces the
read path); read-only mode statically rejects mutating statements before
they reach the engine; result truncation uses ``limit(max_rows+1)`` so the
engine never materializes more than the cap (the reference streams and
cuts at max_rows the same way).
"""

from __future__ import annotations

import re
import time
from typing import Any, Optional

CONTRACT_VERSION = "0.3.0-spark"


# -- errors (reference agents/errors.py) ----------------------------------
class ChDBError(Exception):
    pass


class ChDBSyntaxError(ChDBError):
    pass


class ChDBUnknownObjectError(ChDBError):
    pass


class ChDBReadOnlyError(ChDBError):
    pass


class ChDBResourceError(ChDBError):
    pass


class InvalidIdentifier(ChDBError):
    pass


# -- safety helpers (reference agents/safety.py) --------------------------
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def quote_ident(name: str) -> str:
    """Safely quote an identifier; rejects anything that can't be one."""
    if not isinstance(name, str) or not name or "\x00" in name or "`" in name:
        raise InvalidIdentifier(f"invalid identifier: {name!r}")
    if _IDENT_RE.match(name):
        return f"`{name}`"
    if re.match(r"^[\w .$-]+$", name):
        return f"`{name}`"
    raise InvalidIdentifier(f"invalid identifier: {name!r}")


def quote_string(value: str) -> str:
    """SQL string literal with escaping."""
    return "'" + str(value).replace("\\", "\\\\").replace("'", "\\'") + "'"


# -- results (reference agents/tool.py:67-109) ----------------------------
class QueryResult:
    def __init__(self, rows, truncated, column_names, elapsed_s=None):
        self.rows = rows
        self.truncated = truncated
        self.column_names = column_names
        self.elapsed_s = elapsed_s

    def to_dict(self) -> dict:
        return {
            "rows": self.rows,
            "truncated": self.truncated,
            "column_names": self.column_names,
            "elapsed_s": self.elapsed_s,
        }

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return (
            f"QueryResult(rows={len(self.rows)}, truncated={self.truncated}, "
            f"columns={self.column_names})"
        )


_WRITE_RE = re.compile(
    r"^\s*(INSERT|UPDATE|DELETE|MERGE|CREATE|DROP|ALTER|TRUNCATE|REPLACE|"
    r"SET|RESET|ADD|REFRESH|CACHE|UNCACHE|LOAD|ANALYZE|MSCK|GRANT)\b",
    re.IGNORECASE,
)
_PARAM_RE = re.compile(r"\{(\w+)(?::[A-Za-z0-9()]+)?\}")

_DESCRIPTORS: dict[str, dict] = {
    "run_select_query": {
        "description": "Run a read-only SQL query and return rows plus "
        "truncation metadata.",
        "args": {
            "sql": {"type": "string", "description": "SQL SELECT to run"},
            "params": {
                "type": "object",
                "description": "Values bound to {name} placeholders",
                "required": False,
            },
            "max_rows": {
                "type": "integer",
                "description": "Row cap; result marks truncated when hit",
                "required": False,
            },
        },
    },
    "list_databases": {"description": "List databases.", "args": {}},
    "list_tables": {
        "description": "List tables in a database (current if omitted).",
        "args": {"database": {"type": "string", "required": False}},
    },
    "describe_table": {
        "description": "Columns and types of a table.",
        "args": {"target": {"type": "string"}, "database": {"type": "string", "required": False}},
    },
    "get_sample_data": {
        "description": "A few sample rows from a table.",
        "args": {"target": {"type": "string"}, "limit": {"type": "integer", "required": False}},
    },
    "list_functions": {
        "description": "List available SQL functions.",
        "args": {"like": {"type": "string", "required": False}, "limit": {"type": "integer", "required": False}},
    },
    "attach_file": {
        "description": "Register a local file as a queryable named table.",
        "args": {
            "name": {"type": "string"},
            "path": {"type": "string"},
            "format": {"type": "string", "required": False},
        },
    },
}


def capabilities() -> dict:
    """Probe surface (reference descriptors.py capabilities())."""
    return {
        "contract_version": CONTRACT_VERSION,
        "tools": sorted(_DESCRIPTORS),
        "dialects": ["anthropic", "openai", "mcp"],
        "engine": "spark",
    }


def _json_schema(args: dict) -> dict:
    props, required = {}, []
    for name, spec in args.items():
        props[name] = {
            "type": spec.get("type", "string"),
            "description": spec.get("description", ""),
        }
        if spec.get("required", True):
            required.append(name)
    return {"type": "object", "properties": props, "required": required}


def tool_specs(dialect: str = "anthropic") -> list[dict]:
    """Render the model-visible tool schemas (reference tool.py:559,
    descriptors.json — anthropic input_schema / openai function / mcp
    inputSchema)."""
    out = []
    for name, d in _DESCRIPTORS.items():
        schema = _json_schema(d["args"])
        if dialect == "anthropic":
            out.append(
                {"name": name, "description": d["description"], "input_schema": schema}
            )
        elif dialect == "openai":
            out.append(
                {
                    "type": "function",
                    "function": {
                        "name": name,
                        "description": d["description"],
                        "parameters": schema,
                    },
                }
            )
        elif dialect == "mcp":
            out.append(
                {"name": name, "description": d["description"], "inputSchema": schema}
            )
        else:
            raise ValueError(f"unknown dialect: {dialect!r}")
    return out


class ChDBTool:
    """Spark-backed agent tool (reference tool.py:111).

    >>> tool = ChDBTool(spark, sf_dir="/root/testdata/sf0.01")
    >>> tool.query("SELECT count(*) AS n FROM lineitem").rows
    """

    def __init__(
        self,
        spark=None,
        *,
        sf_dir: Optional[str] = None,
        read_only: bool = True,
        default_max_rows: int = 1000,
    ):
        from chdb_spark.session import get_spark, register_tables

        self.spark = spark or get_spark(app_name="chdb_spark_agents")
        if sf_dir:
            register_tables(self.spark, sf_dir)
        self.read_only = read_only
        self.default_max_rows = default_max_rows

    # -- core query --------------------------------------------------------
    def _bind(self, sql: str, params: Optional[dict]) -> str:
        if not params:
            return sql
        from chdb_spark.dbapi import escape_item

        def sub(m: re.Match) -> str:
            key = m.group(1)
            if key not in params:
                raise ChDBSyntaxError(f"missing bound parameter: {key}")
            return escape_item(params[key])

        return _PARAM_RE.sub(sub, sql)

    def query(
        self, sql: str, *, params: Optional[dict] = None, max_rows: Optional[int] = None
    ) -> QueryResult:
        """run_select_query (reference tool.py:271): read SQL with bound
        params; rows truncated at max_rows with a flag, never an error."""
        if self.read_only and _WRITE_RE.match(sql):
            raise ChDBReadOnlyError("tool is read-only; statement rejected")
        cap = max_rows or self.default_max_rows
        bound = self._bind(sql, params)
        t0 = time.perf_counter()
        try:
            df = self.spark.sql(bound)
            rows = df.limit(cap + 1).collect()
        except Exception as exc:
            raise _classify(exc) from exc
        elapsed = time.perf_counter() - t0
        truncated = len(rows) > cap
        return QueryResult(
            rows=[tuple(r) for r in rows[:cap]],
            truncated=truncated,
            column_names=df.columns,
            elapsed_s=round(elapsed, 4),
        )

    run_select_query = query

    # -- introspection -----------------------------------------------------
    def list_databases(self) -> list[str]:
        return [d.name for d in self.spark.catalog.listDatabases()]

    def list_tables(self, database: Optional[str] = None) -> list[str]:
        try:
            return [t.name for t in self.spark.catalog.listTables(database)]
        except Exception as exc:
            raise _classify(exc) from exc

    def describe(self, target: str, *, database: Optional[str] = None) -> list[dict]:
        full = f"{quote_ident(database)}.{quote_ident(target)}" if database else quote_ident(target)
        try:
            rows = self.spark.sql(f"DESCRIBE TABLE {full}").collect()
        except Exception as exc:
            raise _classify(exc) from exc
        return [
            {"name": r.col_name, "type": r.data_type, "comment": r.comment}
            for r in rows
            if r.col_name and not r.col_name.startswith("#")
        ]

    describe_table = describe

    def get_sample_data(
        self, target: str, *, database: Optional[str] = None, limit: int = 5
    ) -> QueryResult:
        full = f"{quote_ident(database)}.{quote_ident(target)}" if database else quote_ident(target)
        return self.query(f"SELECT * FROM {full}", max_rows=int(limit))

    def list_functions(self, *, like: Optional[str] = None, limit: int = 200) -> list[str]:
        """Spark SQL builtins + the engine registry's reference names."""
        from chdb_spark.functions import registry

        names = {r.function for r in self.spark.sql("SHOW FUNCTIONS").collect()}
        names.update(registry.all_functions())
        out = sorted(names)
        if like:
            pat = re.compile(re.escape(like).replace("%", ".*"), re.IGNORECASE)
            out = [n for n in out if pat.search(n)]
        return out[: int(limit)]

    # -- writable-tool extras ---------------------------------------------
    def attach_file(self, name: str, path: str, format: Optional[str] = None) -> None:
        """Register a local file as a named view (reference tool.py:444;
        writable tools only)."""
        if self.read_only:
            raise ChDBReadOnlyError("attach_file requires a writable tool")
        from chdb_spark.sources.files import read_auto

        df = read_auto(self.spark, path, fmt=format)
        df.createOrReplaceTempView(quote_ident(name).strip("`"))

    def dataframe_query(self, sql: str, dataframes: dict, *, max_rows=None) -> QueryResult:
        """Query over in-memory pandas DataFrames registered as views
        (reference tool.py:467 — the Python() table function analogue;
        Arrow-accelerated createDataFrame)."""
        for name, pdf in dataframes.items():
            self.spark.createDataFrame(pdf).createOrReplaceTempView(
                quote_ident(name).strip("`")
            )
        return self.query(sql, max_rows=max_rows)

    def tool_specs(self, dialect: str = "anthropic") -> list[dict]:
        return tool_specs(dialect)


def _classify(exc: Exception) -> ChDBError:
    msg = str(exc)
    name = type(exc).__name__
    if "PARSE_SYNTAX_ERROR" in msg or "ParseException" in name:
        return ChDBSyntaxError(msg)
    if "TABLE_OR_VIEW_NOT_FOUND" in msg or "UNRESOLVED" in msg.upper():
        return ChDBUnknownObjectError(msg)
    if "AnalysisException" in name:
        return ChDBUnknownObjectError(msg)
    return ChDBError(msg)
