"""Stateful Session — the analogue of ``chdb.session.Session`` (SURVEY §3.3).

Reference semantics (docs/session.rst:26-95): ``Session(path)`` binds an
engine instance to a directory; DDL state (databases, tables, views)
persists across queries and — for file-backed sessions — across process
restarts. ``Session()`` is temporary with auto-cleanup.
``send_query(sql)`` returns a chunked StreamingResult with early ``close()``
(docs/streaming.rst:20-75).

Spark-first: the engine is the shared SparkSession; each Session object is
a *database* in the catalog plus a manifest file under its path. Spark's
default in-memory catalog forgets table metadata on JVM exit, so restart
persistence is provided the engine-agnostic way: after every DDL-bearing
query the session snapshots its catalog (table name → location/schema/
is-view) into ``_chdb_spark_session.json``; opening a Session over an
existing path re-registers every entry (external tables point at their
parquet directories, views re-run their stored text). This keeps the
reference's durable-session contract without depending on a Hive
metastore. Query *data* paths are standard distributed writes — nothing
here collects to the driver.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_chdb_spark_session.json"
_DDL_RE = re.compile(
    r"^\s*(CREATE|DROP|ALTER|REPLACE|INSERT|TRUNCATE)\b", re.IGNORECASE
)
_CT_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(`?\w+`?)\s*", re.IGNORECASE
)


class _BytesChunk(bytes):
    """Format-encoded chunk with the reference's ``rows_read()`` metric
    (docs/streaming.rst:31 ``chunk.rows_read()``). A ``bytes`` subclass, so
    ``chunk.count(b'\\n')``-style consumers keep working unchanged."""

    _rows: int = 0

    def rows_read(self) -> int:
        return self._rows

    def data(self) -> str:
        """Chunk payload as text (docs/streaming.rst:118 ``chunk.data()``)."""
        return self.decode("utf-8", errors="replace")

    def bytes(self) -> bytes:
        return bytes(self)


class _RowsChunk(list):
    """Row-list chunk with ``rows_read()`` (reference chunk metric)."""

    def rows_read(self) -> int:
        return len(self)


class StreamingResult:
    """Chunked pull-based result (reference docs/streaming.rst:20-75).

    ``fetch()`` returns the next chunk (list of Rows) or None when
    exhausted; iteration yields chunks; ``close()`` abandons the
    underlying ``toLocalIterator`` which cancels remaining partition
    computation. Constant driver memory at any result size.
    """

    def __init__(
        self, df: DataFrame, max_rows_per_chunk: int = 65536, fmt: str | None = None
    ):
        from chdb_spark.streaming.core import stream_result

        self._it: Iterator | None = stream_result(df, max_rows_per_chunk)
        self.schema = df.schema
        self._fmt = fmt

    def fetch(self):
        if self._it is None:
            return None
        try:
            chunk = next(self._it)
        except StopIteration:
            self._it = None
            return None
        if self._fmt is not None:
            # format-encoded bytes per chunk (reference send_query(format=);
            # examples.md §8 counts b'\n' in each chunk)
            from chdb_spark.formats import format_rows

            out = _BytesChunk(format_rows(self.schema, chunk, self._fmt))
            out._rows = len(chunk)
            return out
        return _RowsChunk(chunk)

    def close(self) -> None:
        self._it = None

    def record_batch(self, rows_per_batch: int = 10000):
        """Arrow ``RecordBatchReader`` over the stream
        (docs/streaming.rst:180-200: ``stream_result.record_batch(
        rows_per_batch=...)``) — re-chunks the row stream into Arrow
        batches of the requested size; constant driver memory."""
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        schema = to_arrow_schema(self.schema)
        # whatever wire format send_query was given ("Arrow" in the doc
        # example), batches are built from the row stream directly
        self._fmt = None

        def gen():
            buf: list = []
            while True:
                chunk = self.fetch()
                if chunk is None:
                    break
                buf.extend(chunk)
                while len(buf) >= rows_per_batch:
                    head, buf = buf[:rows_per_batch], buf[rows_per_batch:]
                    yield pa.RecordBatch.from_pylist(
                        [r.asDict() for r in head], schema=schema
                    )
            if buf:
                yield pa.RecordBatch.from_pylist(
                    [r.asDict() for r in buf], schema=schema
                )

        return pa.RecordBatchReader.from_batches(schema, gen())

    def __iter__(self):
        while True:
            chunk = self.fetch()
            if chunk is None:
                return
            yield chunk

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _db_name(path: str) -> str:
    base = re.sub(r"[^0-9a-zA-Z_]", "_", os.path.abspath(path).strip("/"))
    return f"sess_{base[-100:]}"


class Session:
    """A stateful SQL session bound to a directory (reference
    docs/session.rst:26-95).

    >>> sess = Session("/tmp/mydb")
    >>> sess.query("CREATE TABLE users AS SELECT 1 AS id")
    >>> sess.query("SELECT * FROM users").show()
    >>> sess.close()          # state persists; reopening restores tables
    """

    def __init__(self, path: str | None = None, spark: SparkSession | None = None):
        from chdb_spark.session import get_spark

        self._tmp = None
        if path is None or path == ":memory:":
            self._tmp = tempfile.TemporaryDirectory(prefix="chdb_spark_sess_")
            path = self._tmp.name
        # connection-string forms: file:path?opt=...  /  path?mode=ro
        if path.startswith("file:"):
            path = path[5:]
        self.options: dict[str, str] = {}
        if "?" in path:
            path, qs = path.split("?", 1)
            for part in qs.split("&"):
                if part:
                    k, _, v = part.partition("=")
                    self.options[k] = v
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)
        self.spark = spark or get_spark(app_name="chdb_spark_session")
        self.db = _db_name(self.path)
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{self.db}`")
        self._restore()
        #: session-scoped CH settings (``SET k = v``) — merged under each
        #: query's own SETTINGS clause (query-level wins), reference
        #: session semantics
        self.settings: dict[str, str] = {}
        self._closed = False

    # -- internal: manifest-based persistence -----------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, _MANIFEST)

    def _snapshot(self) -> None:
        entries = []
        for t in self.spark.catalog.listTables(self.db):
            if t.tableType == "TEMPORARY":
                continue
            full = f"`{self.db}`.`{t.name}`"
            if t.tableType == "VIEW":
                text = self.spark.sql(f"SHOW CREATE TABLE {full}").first()[0]
                entries.append({"name": t.name, "kind": "view", "create": text})
            else:
                detail = {
                    r["col_name"]: r["data_type"]
                    for r in self.spark.sql(f"DESCRIBE TABLE EXTENDED {full}").collect()
                }
                loc = detail.get("Location") or ""
                if loc.startswith("file:"):
                    loc = loc[5:]
                # store session-relative so the whole directory stays
                # relocatable (durable checkpoints restore it elsewhere)
                if loc.startswith(self.path + os.sep):
                    loc = os.path.relpath(loc, self.path)
                entries.append(
                    {
                        "name": t.name,
                        "kind": "table",
                        "location": loc or None,
                        "provider": (detail.get("Provider") or "parquet").lower(),
                    }
                )
        with open(self._manifest_path, "w") as fh:
            json.dump({"db": self.db, "tables": entries}, fh, indent=1)

    def _restore(self) -> None:
        if not os.path.exists(self._manifest_path):
            return
        with open(self._manifest_path) as fh:
            manifest = json.load(fh)
        existing = {t.name for t in self.spark.catalog.listTables(self.db)}
        prev = self.spark.catalog.currentDatabase()
        # view bodies may reference session tables unqualified — replay with
        # the session database current, tables before views
        self.spark.catalog.setCurrentDatabase(self.db)
        try:
            for e in manifest.get("tables", []):
                if e["name"] in existing:
                    continue
                if e["kind"] == "table" and e.get("location"):
                    loc = e["location"]
                    if not os.path.isabs(loc):
                        loc = os.path.join(self.path, loc)
                    self.spark.sql(
                        f"CREATE TABLE IF NOT EXISTS `{self.db}`.`{e['name']}` "
                        f"USING {e.get('provider', 'parquet')} "
                        f"LOCATION '{loc}'"
                    )
            for e in manifest.get("tables", []):
                if e["kind"] == "view" and e["name"] not in existing and e.get("create"):
                    try:
                        self.spark.sql(e["create"])
                    except Exception:
                        pass  # view over a table dropped outside the session
        finally:
            self.spark.catalog.setCurrentDatabase(prev)

    def _localize_create_table(self, sql: str) -> str:
        """Rewrite a bare ``CREATE TABLE name …`` so the table is EXTERNAL
        parquet under ``<session path>/tables/<name>`` — table data lives in
        the session directory, exactly the reference's file-backed-session
        contract (docs/session.rst:50-66: MergeTree data under the session
        path). Statements that already carry USING/LOCATION/db-qualified
        names pass through untouched.
        """
        m = _CT_RE.match(sql)
        if not m or re.search(r"\b(LOCATION|USING)\b", sql, re.IGNORECASE):
            return sql
        name = m.group(1).strip("`")
        loc = os.path.join(self.path, "tables", name)
        rest = sql[m.end():].lstrip()
        clause = f"USING parquet LOCATION '{loc}' "
        if rest.upper().startswith("AS"):
            return sql[: m.end()] + clause + rest
        if rest.startswith("("):  # column-definition form: clause goes last
            return sql.rstrip().rstrip(";") + " " + clause
        return sql

    # -- public API --------------------------------------------------------
    def query(self, sql: str, fmt: str = "DataFrame", params: dict | None = None) -> Any:
        """Execute SQL with this session's database current
        (reference Session.query, docs/session.rst:34-44).

        fmt: the output_format axis of chdb.query (chdb/__init__.py:145-217)
        — 'DataFrame' (lazy Spark DataFrame), 'Pandas', 'ArrowTable',
        'Arrow'/'Parquet' (bytes), or any ClickHouse text format name
        ('Pretty', 'CSV', 'CSVWithNames', 'JSON', 'JSONEachRow', 'TSV',
        'Values', 'Vertical', …) — see chdb_spark.formats.supported_formats().
        params: values for ``{key:Type}`` placeholders (chdb_spark.params).
        """
        if self._closed:
            raise RuntimeError("session is closed")
        from chdb_spark.formats import format_result, split_format_suffix
        from chdb_spark.params import bind_params

        from chdb_spark.dialect import extract_settings, resolve_table_functions, rewrite

        sql = bind_params(sql, params)
        # CH `INSERT INTO t [(cols)] FROM INFILE 'path' [SETTINGS …]
        # FORMAT Fmt` (public CH statement; the reference's own cc_backend
        # insert path emits exactly this, chdb/cc_backend.py:840). Checked
        # BEFORE the format-suffix split — here the trailing FORMAT names
        # the FILE's format, not the output format.
        m_inf = re.match(
            r"(?is)^\s*INSERT\s+INTO\s+([`\w.]+)\s*(\(([^)]*)\))?\s*"
            r"FROM\s+INFILE\s+'([^']+)'.*?FORMAT\s+(\w+)\s*;?\s*$",
            sql,
        )
        if m_inf:
            return self._insert_infile(m_inf, fmt)
        sql, suffix_fmt = split_format_suffix(sql)
        if suffix_fmt is not None:
            fmt = suffix_fmt
        # CH `INSERT INTO [TABLE] FUNCTION target(...) SELECT …`
        # (reference core.py:5502): the SELECT re-enters this method (full
        # dialect + session-table resolution), the write dispatches to the
        # target, and an empty status result returns like DDL.
        from chdb_spark.dialect import handle_insert_table_function

        if handle_insert_table_function(
            sql, lambda s: self.query(s, fmt="DataFrame")
        ):
            return format_result(
                self.spark.sql("SELECT '' AS status WHERE false"),
                fmt or "DataFrame",
            )
        # CH-dialect acceptance, same layer as session.query (DDL with
        # ENGINE/CH types, CH function names, table functions)
        # CH `SET key = value`: persist for the session (engine settings,
        # not Spark confs — those go through spark.conf directly)
        m_set = re.match(r"^\s*SET\s+(\w+)\s*=\s*('([^']*)'|\S+)\s*;?\s*$", sql, re.IGNORECASE)
        if m_set and "." not in m_set.group(1):
            self.settings[m_set.group(1)] = (
                m_set.group(3) if m_set.group(3) is not None else m_set.group(2)
            )
            from chdb_spark.formats import format_result as _fr

            return _fr(self.spark.sql("SELECT '' AS status WHERE false"), fmt or "DataFrame")
        # CH mutations (public ALTER TABLE … DELETE/UPDATE, TRUNCATE —
        # ClickHouse docs/sql-reference/statements/alter): Spark SQL has no
        # in-place mutation for external tables, so these rewrite the
        # table: snapshot the surviving/updated rows (localCheckpoint cuts
        # the lineage to the files being overwritten), then positional
        # INSERT OVERWRITE. Session tables are session-scale; at warehouse
        # scale the same statements belong to Delta/Iceberg (jar-gated).
        m_mut = re.match(
            r"^\s*(?:ALTER\s+TABLE\s+([`\w.]+)\s+"
            r"(DELETE|UPDATE|ADD\s+COLUMN|DROP\s+COLUMN|RENAME\s+COLUMN)\s+(.*?)"
            r"|(TRUNCATE)\s+TABLE\s+(IF\s+EXISTS\s+)?([`\w.]+))\s*;?\s*$",
            sql, re.IGNORECASE | re.DOTALL,
        )
        if m_mut:
            return self._apply_mutation(m_mut, fmt)
        # CH `EXISTS [TABLE] name` → UInt8 1/0 (needs the catalog, so it
        # can't be a pure-text dialect rewrite; also handled in
        # session.query for the one-shot shape)
        m_exists = re.match(
            r"^\s*EXISTS\s+(?:TABLE\s+)?([`\w.]+)\s*;?\s*$", sql, re.IGNORECASE
        )
        if m_exists:
            name = m_exists.group(1).replace("`", "")
            prev_db = self.spark.catalog.currentDatabase()
            try:
                self.spark.catalog.setCurrentDatabase(self.db)
                found = self.spark.catalog.tableExists(name)
            except Exception:
                found = False
            finally:
                self.spark.catalog.setCurrentDatabase(prev_db)
            sql = f"SELECT CAST({1 if found else 0} AS TINYINT) AS result"
        sql, ch_settings = extract_settings(sql)
        ch_settings = {**self.settings, **ch_settings}
        from chdb_spark.dialect import extract_with_fill

        sql, fill_spec = extract_with_fill(sql)
        sql = rewrite(sql)
        from chdb_spark.dialect import _TF_RE

        if _TF_RE.search(sql):
            sql = resolve_table_functions(self.spark, sql)
        prev = self.spark.catalog.currentDatabase()
        self.spark.catalog.setCurrentDatabase(self.db)
        # ASOF/ANY resolution looks relations up via spark.table(), so it
        # must run AFTER the switch to the session db — otherwise session
        # tables (the normal operands here) are not resolvable
        try:
            if re.search(r"\bASOF\s+(LEFT\s+)?JOIN\b", sql, re.IGNORECASE):
                from chdb_spark.dialect import resolve_asof_join

                sql = resolve_asof_join(self.spark, sql)
            if re.search(
                r"\bANY\s+(LEFT\s+|INNER\s+|RIGHT\s+)?JOIN\b"
                r"|\b(LEFT|INNER|RIGHT)\s+ANY\s+JOIN\b",
                sql, re.IGNORECASE,
            ):
                from chdb_spark.dialect import resolve_any_join

                sql = resolve_any_join(self.spark, sql)
        except Exception:
            self.spark.catalog.setCurrentDatabase(prev)
            raise
        if "__system_" in sql:
            # snapshot AFTER switching to the session db so currentDatabase()
            # introspection sees the session's tables
            from chdb_spark.dialect import resolve_system_tables

            resolve_system_tables(self.spark, sql)
        try:
            out = self.spark.sql(self._localize_create_table(sql))
            if fill_spec is not None:
                from chdb_spark.session import _apply_with_fill

                out = _apply_with_fill(self.spark, out, fill_spec)
            if _DDL_RE.match(sql):
                self._snapshot()
            if fmt == "arrow":  # pre-round-3 alias: bytes were never returned
                fmt = "ArrowTable"
            return format_result(out, fmt or "DataFrame", settings=ch_settings)
        finally:
            self.spark.catalog.setCurrentDatabase(prev)

    sql = query

    def _apply_mutation(self, m: "re.Match", fmt: str):
        """Execute a CH mutation statement (ALTER … DELETE/UPDATE,
        TRUNCATE) by rewriting the table — see the call site for the
        contract. Returns an empty status result like DDL."""
        from chdb_spark.dialect import rewrite as _rw
        from chdb_spark.formats import format_result as _fr

        prev = self.spark.catalog.currentDatabase()
        self.spark.catalog.setCurrentDatabase(self.db)
        try:
            if m.group(4):  # TRUNCATE
                name = m.group(6).replace("`", "")
                if m.group(5) and not self.spark.catalog.tableExists(name):
                    return _fr(  # IF EXISTS on a missing table: silent no-op
                        self.spark.sql("SELECT '' AS status WHERE false"),
                        fmt or "DataFrame",
                    )
                snap = self.spark.table(name).where("false").localCheckpoint()
            else:
                name = m.group(1).replace("`", "")
                verb = re.sub(r"\s+", " ", m.group(2)).upper()
                body = m.group(3).strip()
                tbl = self.spark.table(name)
                if verb in ("ADD COLUMN", "DROP COLUMN", "RENAME COLUMN"):
                    return self._apply_schema_change(name, tbl, verb, body, fmt)
                if verb == "DELETE":
                    mw = re.match(r"(?is)^WHERE\s+(.*)$", body)
                    if not mw:
                        raise ValueError("ALTER TABLE … DELETE requires WHERE")
                    cond = _rw(f"SELECT ({mw.group(1)})")[8:-1]
                    snap = tbl.where(f"NOT ({cond}) OR ({cond}) IS NULL")
                else:  # UPDATE col = expr[, …] WHERE cond
                    mu = re.match(r"(?is)^(.*?)\s+WHERE\s+(.*)$", body)
                    if not mu:
                        raise ValueError("ALTER TABLE … UPDATE requires WHERE")
                    assigns, cond_raw = mu.group(1), mu.group(2)
                    cond = _rw(f"SELECT ({cond_raw})")[8:-1]
                    updates = {}
                    for part in re.split(r",(?![^()]*\))", assigns):
                        k, _, v = part.partition("=")
                        if not _:
                            raise ValueError(f"bad UPDATE assignment {part!r}")
                        updates[k.strip().strip("`")] = _rw(f"SELECT ({v.strip()})")[8:-1]
                    sel = [
                        f"CASE WHEN ({cond}) THEN ({updates[c]}) ELSE `{c}` END AS `{c}`"
                        if c in updates else f"`{c}`"
                        for c in tbl.columns
                    ]
                    snap = tbl.selectExpr(*sel).localCheckpoint()
                if verb == "DELETE":
                    snap = snap.localCheckpoint()
            snap.write.mode("overwrite").insertInto(name, overwrite=True)
            return _fr(
                self.spark.sql("SELECT '' AS status WHERE false"),
                fmt or "DataFrame",
            )
        finally:
            self.spark.catalog.setCurrentDatabase(prev)

    def _insert_infile(self, m: "re.Match", fmt: str):
        """INSERT … FROM INFILE: read the file with the Spark-native
        reader (distributed scan — the file may be a glob of shards) and
        positionally insert into the session table. Headerless CH CSV/TSV
        columns map by position onto the table schema."""
        from chdb_spark.formats import format_result as _fr
        from chdb_spark.session import read_table as _rt  # noqa: F401
        from chdb_spark.sources import read_auto

        name = m.group(1).replace("`", "")
        cols = [c.strip().strip("`") for c in (m.group(3) or "").split(",") if c.strip()]
        path, ch_fmt = m.group(4), m.group(5)
        f = ch_fmt.lower()
        opts: dict = {}
        if f.startswith(("csv", "tsv", "tabseparated")):
            has_names = "withnames" in f
            spark_fmt = "tsv" if f.startswith(("tsv", "tabseparated")) else "csv"
            opts = {"header": str(has_names).lower(), "inferSchema": "true"}
        elif f in ("parquet", "orc", "avro", "arrow", "native"):
            spark_fmt = "parquet" if f == "native" else f
        elif f.startswith("json"):
            spark_fmt = "json"
        else:
            raise ValueError(f"INSERT FROM INFILE: unsupported format {ch_fmt!r}")
        named = f.startswith(("parquet", "orc", "avro", "arrow", "json")) or (
            "withnames" in f
        )
        prev = self.spark.catalog.currentDatabase()
        self.spark.catalog.setCurrentDatabase(self.db)
        try:
            df = read_auto(self.spark, path, fmt=spark_fmt, **opts)
            target_cols = cols or self.spark.table(name).columns
            if named:
                # self-describing / header formats map BY NAME (the CH
                # input_format_with_names_use_header=1 default; Spark's
                # JSON inference even alphabetizes fields, so positions
                # are meaningless here)
                missing = [tc for tc in target_cols if tc not in df.columns]
                if missing:
                    raise ValueError(
                        f"INSERT FROM INFILE: file lacks columns {missing} "
                        f"named by the target (file has {df.columns})"
                    )
                sel = [df[tc] for tc in target_cols]
            else:
                # headerless CSV/TSV: positional (the CH contract)
                if len(df.columns) < len(target_cols):
                    raise ValueError(
                        f"INSERT FROM INFILE: file has {len(df.columns)} "
                        f"columns, target needs {len(target_cols)}"
                    )
                sel = [
                    df[df.columns[i]].alias(tc)
                    for i, tc in enumerate(target_cols)
                ]
            out = df.select(*sel)
            if cols:  # fill unlisted columns with NULLs in table order
                tbl_schema = self.spark.table(name)
                full = [
                    out[c] if c in cols else
                    F.lit(None).cast(dict(tbl_schema.dtypes)[c]).alias(c)
                    for c in tbl_schema.columns
                ]
                out = out.select(*full)
            out.write.mode("append").insertInto(name)
            return _fr(
                self.spark.sql("SELECT '' AS status WHERE false"),
                fmt or "DataFrame",
            )
        finally:
            self.spark.catalog.setCurrentDatabase(prev)

    def _apply_schema_change(self, name: str, tbl, verb: str, body: str, fmt: str):
        """ALTER TABLE ADD/DROP/RENAME COLUMN for external parquet session
        tables (Spark's v1 parquet tables reject these natively): build the
        new-schema snapshot, drop the catalog entry, rewrite the files at
        the SAME location, re-register. Caller holds the session-db
        context."""
        from chdb_spark.dialect import map_ch_types
        from chdb_spark.formats import format_result as _fr

        if verb == "ADD COLUMN":
            ma = re.match(
                r"(?is)^(?:IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?\s+([\w()<>,'\s]+?)"
                r"(?:\s+DEFAULT\s+(.+))?$",
                body,
            )
            if not ma:
                raise ValueError(f"unsupported ADD COLUMN body {body!r}")
            col, ch_type, default = ma.group(1), ma.group(2).strip(), ma.group(3)
            if col in tbl.columns:
                snap = tbl
            else:
                sp_type = map_ch_types(ch_type)
                dexpr = default if default is not None else "NULL"
                snap = tbl.selectExpr(
                    "*", f"CAST(({dexpr}) AS {sp_type}) AS `{col}`"
                )
        elif verb == "DROP COLUMN":
            col = re.sub(r"(?is)^IF\s+EXISTS\s+", "", body).strip().strip("`")
            snap = tbl.drop(col)
        else:  # RENAME COLUMN a TO b
            mr = re.match(r"(?is)^`?(\w+)`?\s+TO\s+`?(\w+)`?$", body)
            if not mr:
                raise ValueError(f"unsupported RENAME COLUMN body {body!r}")
            snap = tbl.withColumnRenamed(mr.group(1), mr.group(2))
        snap = snap.localCheckpoint()
        loc = next(
            r.data_type
            for r in self.spark.sql(f"DESCRIBE FORMATTED {name}").collect()
            if r.col_name == "Location"
        )
        self.spark.sql(f"DROP TABLE {name}")
        snap.write.mode("overwrite").parquet(loc)
        self.spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{loc}'")
        self._snapshot()
        return _fr(
            self.spark.sql("SELECT '' AS status WHERE false"), fmt or "DataFrame"
        )

    def send_query(
        self,
        sql: str,
        format: str | None = None,
        max_rows_per_chunk: int = 65536,
        params: dict | None = None,
    ) -> StreamingResult:
        """Streaming execution (reference docs/streaming.rst:20-75).
        With ``format=`` each fetched chunk is format-encoded bytes
        (reference examples.md §8: ``chunk.count(b'\n')``); without it,
        chunks are lists of Rows."""
        return StreamingResult(
            self.query(sql, params=params), max_rows_per_chunk, fmt=format
        )

    def close(self) -> None:
        """Detach; file-backed state persists (reference session.rst:66)."""
        if not self._closed:
            self._snapshot()
        self._closed = True
        if self._tmp is not None:  # temporary session: drop its database
            self.spark.sql(f"DROP DATABASE IF EXISTS `{self.db}` CASCADE")
            self._tmp.cleanup()
            self._tmp = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
