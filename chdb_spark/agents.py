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

import json
import os
import re
import threading
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


class ChDBAllowlistError(ChDBError):
    pass


class ChDBTimeoutError(ChDBError):
    pass


class ChDBUnknownFunctionError(ChDBError):
    pass


class ChDBInvalidArgument(ChDBError):
    pass


class InvalidIdentifier(ChDBError):
    pass


#: exception class → CONTRACT.md canonical error type string
ERROR_TYPE_OF = {
    ChDBReadOnlyError: "READONLY",
    ChDBAllowlistError: "ALLOWLIST_DENIED",
    ChDBTimeoutError: "TIMEOUT_EXCEEDED",
    ChDBResourceError: "TOO_MANY_ROWS_OR_BYTES",
    ChDBUnknownFunctionError: "UNKNOWN_FUNCTION",
    ChDBInvalidArgument: "INVALID_ARGUMENT",
    ChDBSyntaxError: "SYNTAX_ERROR",
    ChDBUnknownObjectError: "UNKNOWN_OBJECT",
    InvalidIdentifier: "TOOL_ERROR",
}


def error_type(exc: Exception) -> str:
    for cls, name in ERROR_TYPE_OF.items():
        if isinstance(exc, cls):
            return name
    return "TOOL_ERROR"


def _int_arg(value, name: str) -> int:
    """CONTRACT P3: numeric arguments must be ints — a non-numeric cap is
    INVALID_ARGUMENT, never a silent default."""
    if isinstance(value, bool) or not isinstance(value, (int, float, str)):
        raise ChDBInvalidArgument(f"{name} must be an integer, got {value!r}")
    try:
        return int(value)
    except (TypeError, ValueError):
        raise ChDBInvalidArgument(f"{name} must be an integer, got {value!r}") from None


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
        "features": {"dataframe_query": True, "attach_file": True},
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
        max_rows: Optional[int] = None,
        max_bytes: int = 1_000_000,
        max_execution_time: Optional[float] = None,
        file_allowlist: Optional[list[str]] = None,
        attachments: Optional[dict] = None,
        network_timeout: Optional[float] = None,
    ):
        """CONTRACT.md constructor config: ``max_rows`` is the per-tool hard
        cap every call is clamped to; ``max_bytes`` caps the UTF-8 size of
        the compact-JSON-encoded result rows; ``max_execution_time`` (s) is
        the query watchdog; ``file_allowlist`` restricts file() to the given
        path prefixes (None = unrestricted, the reference's readonly=2
        default); ``attachments`` pre-registers {name: path} views;
        ``network_timeout`` is accepted for config parity (HTTP fetches go
        through the url() reader which applies its own socket timeouts)."""
        from chdb_spark.session import get_spark, register_tables

        self.spark = spark or get_spark(app_name="chdb_spark_agents")
        if sf_dir:
            register_tables(self.spark, sf_dir)
        self.read_only = read_only
        self.default_max_rows = default_max_rows
        self.hard_max_rows = _int_arg(max_rows, "max_rows") if max_rows is not None else None
        self.max_bytes = max(1, _int_arg(max_bytes, "max_bytes"))
        self.max_execution_time = max_execution_time
        self.file_allowlist = [os.path.abspath(p) for p in file_allowlist] if file_allowlist else None
        self.network_timeout = network_timeout
        for name, path in (attachments or {}).items():
            self._attach(name, path)

    def _attach(self, name: str, path: str) -> None:
        from chdb_spark.sources.files import infer_format, read_auto

        fmt = infer_format(path)
        opts = {"header": "true", "inferSchema": "true"} if fmt == "csv" else {}
        read_auto(self.spark, path, fmt=fmt, **opts).createOrReplaceTempView(
            quote_ident(name).strip("`")
        )

    # -- P1: table-function safety scan -------------------------------------
    def _scan_table_functions(self, sql: str) -> None:
        """Deny external-reach table functions unless allowlisted
        (CONTRACT P1). Obfuscation-resistant: the scan normalizes block
        comments and backticks OUTSIDE string literals first, so
        ``file/**/(…)`` and `` `file`(…) `` are caught; text inside string
        literals stays inert. Non-literal path arguments (concat(...))
        cannot be allowlist-checked and are denied outright."""
        from chdb_spark.dialect import _TF_RE, _balanced, _end_of_string, _split_args, _tf_literal

        # normalize outside strings: strip /*..*/ and backticks
        out = []
        i, n = 0, len(sql)
        while i < n:
            c = sql[i]
            if c in "'\"":
                j = _end_of_string(sql, i)
                out.append(sql[i:j])
                i = j
                continue
            if c == "`":
                i += 1
                continue
            if sql.startswith("/*", i):
                j = sql.find("*/", i + 2)
                i = (j + 2) if j >= 0 else n
                continue
            out.append(c)
            i += 1
        norm = "".join(out)
        i = 0
        n = len(norm)
        while i < n:
            c = norm[i]
            if c in "'\"":
                i = _end_of_string(norm, i)
                continue
            m = _TF_RE.match(norm, i)
            if m and (i == 0 or not (norm[i - 1].isalnum() or norm[i - 1] in "_.")):
                name = m.group(1).lower()
                inner, end = _balanced(norm, m.end() - 1)
                if name in ("file", "url", "s3", "gcs", "hdfs", "azureblobstorage"):
                    if self.file_allowlist is None:
                        i = end
                        continue
                    args = _split_args(inner)
                    path = _tf_literal(args[0]) if args else None
                    if path is None or not any(
                        os.path.abspath(path).startswith(p) for p in self.file_allowlist
                    ):
                        raise ChDBAllowlistError(
                            f"{name}() target not in file_allowlist: "
                            f"{path if path is not None else '<non-literal argument>'}"
                        )
                i = end
                continue
            i += 1

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
        """run_select_query (reference tool.py:271): CH-dialect read SQL
        with bound params; truncation is flagged, never silent (P3); the
        P1 table-function scan and P5 watchdog run first."""
        if self.read_only and _WRITE_RE.match(sql):
            raise ChDBReadOnlyError("tool is read-only; statement rejected")
        cap = _int_arg(max_rows, "max_rows") if max_rows is not None else self.default_max_rows
        if self.hard_max_rows is not None:
            cap = min(cap, self.hard_max_rows)  # per-call caps clamp to tool cap
        self._scan_table_functions(sql)
        bound = self._bind(sql, params)
        from chdb_spark.dialect import _TF_RE, extract_settings, resolve_table_functions, rewrite

        bound, ch_settings = extract_settings(bound)
        t0 = time.perf_counter()
        try:
            translated = rewrite(bound)
            if _TF_RE.search(translated):
                translated = resolve_table_functions(self.spark, translated)
            df = self.spark.sql(translated)
            # P5: SETTINGS max_result_rows + result_overflow_mode='throw'
            overflow_cap = None
            if str(ch_settings.get("result_overflow_mode", "")) == "throw":
                overflow_cap = _int_arg(
                    ch_settings.get("max_result_rows", 0), "max_result_rows"
                )
            fetch = cap + 1
            if overflow_cap:
                fetch = max(fetch, overflow_cap + 1)
            rows = self._collect_with_deadline(df, fetch)
        except ChDBError:
            raise
        except Exception as exc:
            raise _classify(exc) from exc
        if overflow_cap and len(rows) > overflow_cap:
            raise ChDBResourceError(
                f"result exceeds max_result_rows={overflow_cap} with "
                "result_overflow_mode='throw' — add a LIMIT or raise the setting"
            )
        elapsed = time.perf_counter() - t0
        truncated = len(rows) > cap
        rows = rows[:cap]
        # P3 secondary byte guard: UTF-8 bytes of each row's compact JSON
        # object (the cross-binding measure CONTRACT.md P3 specifies)
        cols = df.columns
        size = 0
        for i, r in enumerate(rows):
            obj = dict(zip(cols, [_jsonable(v) for v in r]))
            size += len(json.dumps(obj, separators=(",", ":"), ensure_ascii=False).encode())
            if size > self.max_bytes:
                rows = rows[:i]
                truncated = True
                break
        return QueryResult(
            rows=[tuple(r) for r in rows],
            truncated=truncated,
            column_names=cols,
            elapsed_s=round(elapsed, 4),
        )

    def _collect_with_deadline(self, df, fetch: int):
        """P5 watchdog: run the collect in a daemon thread tagged with a
        cancellable job group; on expiry cancel the group's Spark jobs and
        raise TIMEOUT — the cluster stops burning, unlike the reference's
        abandoned native call."""
        if not self.max_execution_time:
            return df.limit(fetch).collect()
        sc = self.spark.sparkContext
        group = f"chdb_tool_{id(df)}_{time.monotonic_ns()}"
        outcome: dict = {}
        done = threading.Event()

        def run():
            try:
                sc.setJobGroup(group, "agent-tool query", interruptOnCancel=True)
                outcome["rows"] = df.limit(fetch).collect()
            except Exception as exc:  # surfaced below if within deadline
                outcome["exc"] = exc
            finally:
                done.set()

        t = threading.Thread(target=run, daemon=True)
        t.start()
        if not done.wait(self.max_execution_time):
            sc.cancelJobGroup(group)
            raise ChDBTimeoutError(
                f"query exceeded max_execution_time={self.max_execution_time}s; "
                "Spark jobs cancelled"
            )
        if "exc" in outcome:
            raise outcome["exc"]
        return outcome["rows"]

    run_select_query = query

    # -- P4: tool-dispatch envelope ----------------------------------------
    def call(self, name: str, arguments) -> dict:
        """Dispatch a tool by canonical name, returning the P4 envelope:
        ``{ok, result, error:{type, message, hint?}}`` — errors are data,
        never raised across the dispatch boundary."""
        try:
            if not isinstance(arguments, dict):
                raise ChDBInvalidArgument(
                    f"arguments must be an object, got {type(arguments).__name__}"
                )
            if name not in _DESCRIPTORS:
                raise ChDBInvalidArgument(f"unknown tool: {name!r}")
            method = getattr(self, name)
            result = method(**arguments)
        except Exception as exc:
            err = {"type": error_type(exc), "message": str(exc)}
            if isinstance(exc, ChDBResourceError):
                err["hint"] = "add a LIMIT, or raise max_result_rows"
            return {"ok": False, "result": None, "error": err}
        if isinstance(result, QueryResult):
            payload = result.to_dict()
            if result.truncated:
                payload["hint"] = (
                    "result truncated — narrow the query or raise max_rows"
                )
            return {"ok": True, "result": payload, "error": None}
        return {"ok": True, "result": result, "error": None}

    def _tf_df(self, target: str):
        """A DataFrame for a table-function expression target like
        ``numbers(5)`` (CONTRACT: describe/get_sample_data accept table
        functions, not just names)."""
        from chdb_spark.dialect import _TF_RE, resolve_table_functions, rewrite

        self._scan_table_functions(target)
        text = rewrite(f"SELECT * FROM {target}")
        if _TF_RE.search(text):
            text = resolve_table_functions(self.spark, text)
        return self.spark.sql(text)

    # -- introspection -----------------------------------------------------
    def list_databases(self) -> list[str]:
        # CH always exposes `system` and `default`; keep that contract so
        # agent prompts written against the reference keep working
        return sorted(
            {d.name for d in self.spark.catalog.listDatabases()} | {"system", "default"}
        )

    def list_tables(self, database: Optional[str] = None) -> list[str]:
        try:
            return [t.name for t in self.spark.catalog.listTables(database)]
        except Exception as exc:
            raise _classify(exc) from exc

    def describe(self, target: str, *, database: Optional[str] = None) -> list[dict]:
        if database is not None:
            quote_ident(database)  # "" or junk → TOOL_ERROR before resolution
        if "(" in target and not database:
            # table-function expression: describe its resolved schema
            df = self._tf_df(target)
            return [
                {"name": f.name, "type": f.dataType.simpleString(), "comment": None}
                for f in df.schema.fields
            ]
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
        limit = _int_arg(limit, "limit")
        if "(" in target and not database:
            return self.query(f"SELECT * FROM {target}", max_rows=limit)
        full = f"{quote_ident(database)}.{quote_ident(target)}" if database else quote_ident(target)
        return self.query(f"SELECT * FROM {full}", max_rows=limit)

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
        import pandas as pd

        views = []
        for name, pdf in dataframes.items():
            if isinstance(pdf, dict):  # conformance fixture: {col: [values]}
                pdf = pd.DataFrame(pdf)
            view = quote_ident(name).strip("`")
            self.spark.createDataFrame(pdf).createOrReplaceTempView(view)
            views.append(view)
            # Python(name) in the SQL resolves to the registered view (the
            # dialect's caller-frame lookup doesn't apply in tool dispatch)
            sql = re.sub(rf"\bPython\(\s*{re.escape(name)}\s*\)", view, sql)
        try:
            return self.query(sql, max_rows=max_rows)
        finally:
            # transient per-query tables (reference Python() scope): a
            # leftover temp view would SHADOW same-named database tables
            # for every later user of the shared session
            for view in views:
                self.spark.catalog.dropTempView(view)

    def tool_specs(self, dialect: str = "anthropic") -> list[dict]:
        return tool_specs(dialect)


def _jsonable(v):
    """One cell as a JSON-encodable value for the P3 byte measure."""
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    return v


def _classify(exc: Exception) -> ChDBError:
    msg = str(exc)
    name = type(exc).__name__
    if "PARSE_SYNTAX_ERROR" in msg or "ParseException" in name:
        return ChDBSyntaxError(msg)
    if "UNRESOLVED_ROUTINE" in msg or "Undefined function" in msg:
        return ChDBUnknownFunctionError(msg)
    if "TABLE_OR_VIEW_NOT_FOUND" in msg or "UNRESOLVED" in msg.upper():
        return ChDBUnknownObjectError(msg)
    if "AnalysisException" in name:
        return ChDBUnknownObjectError(msg)
    return ChDBError(msg)
