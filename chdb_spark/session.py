"""Session management — the Spark analogue of chDB's Session / connection.

Reference semantics (SURVEY.md §3.3): a chDB ``Session(path)`` binds an
in-process engine to a directory; ``chdb.query(sql, fmt)`` is a one-shot
query (reference chdb/__init__.py:145-217). In Spark the SparkSession *is*
the session; persistence comes from ``spark.sql.warehouse.dir`` and
parquet/Delta tables.

Scale posture: confs below are chosen for a real cluster, not just local[32]:
AQE on (runtime shuffle-partition coalescing, skew-join splitting, join
strategy switch), Arrow for every JVM<->Python crossing, and a shuffle
partition count that AQE can shrink. On a 1000-executor cluster the same
code runs unchanged; only ``master`` and memory sizing differ.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

class ChdbError(Exception):
    """Raised when a reference-shape ``query(sql, fmt)`` fails — the
    reference's error contract (chdb/__init__.py:31: one exception type
    wrapping the engine's message). Spark-shape calls keep Spark's typed
    exceptions (AnalysisException etc.) for programmatic handling."""


TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Confs that matter at 100 TB. Every one of these is also correct at sf0.001.
DEFAULT_CONFS: dict[str, str] = {
    # Adaptive execution: coalesce shuffle partitions, convert sort-merge to
    # broadcast at runtime, split skewed partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for toPandas / pandas_udf / mapInPandas (reference exchanges data
    # zero-copy via Arrow buffers, chdb/__init__.py:107-118 — this is the
    # Spark analogue).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Shuffle sizing is NOT a constant: get_spark derives it from the
    # session's core count (2x cores, AQE coalesces down) so local mode,
    # the driver's lower-core scaling runs, and clusters each get a
    # proportionate value — see _derived_shuffle_partitions.
    # Read-side: 128 MiB splits keep scan partitions memory-safe at any SF.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast threshold: dims (region/nation/supplier/part at small SF)
    # broadcast; AQE upgrades joins at runtime when sides turn out small.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # ANSI off → SQL-standard permissive arithmetic like the reference engine
    # (overflow wraps, bad casts null) — matches DuckDB's non-strict reads.
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    # Parquet TIMESTAMP(NANOS) columns (e.g. events.ts) read as long nanos;
    # read_table() restores TimestampType via integer division (µs).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.showConsoleProgress": "false",
    "spark.ui.enabled": "false",
    # wide generated expressions (64-col simhash fold, unrolled vector dots)
    # need more analyzer fixpoint iterations than the default 100
    "spark.sql.analyzer.maxIterations": "1000",
    # local[32] runs executors inside the driver JVM — the 1g default heap
    # is undersized for 32 concurrent tasks + wide codegen'd plans.
    # Ignored (set by the cluster manager) on a real deployment.
    "spark.driver.memory": "8g",
}


def _derived_shuffle_partitions(master: str | None) -> int | None:
    """Scale-adaptive shuffle sizing (guide §2.4): ~2x the session's cores,
    with AQE coalescing down per-query. A constant is tuned to exactly one
    machine — wrong on clusters AND on the driver's lower-core scaling
    runs. Returns None (leave the conf to spark-submit / Spark defaults +
    AQE) when the core count isn't knowable here, i.e. a cluster master."""
    if master is None or not master.startswith("local"):
        return None
    n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "1"
    if n in ("*", ""):
        cores = os.cpu_count() or 8
    elif n.isdigit():
        cores = int(n)
    else:  # local[N,maxFailures] etc.
        head = n.split(",")[0]
        cores = int(head) if head.isdigit() else (os.cpu_count() or 8)
    return max(2 * cores, 8)


def get_spark(
    app_name: str = "chdb_spark",
    master: str | None = None,
    confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured; on a real deployment, leave it to
    spark-submit.
    """
    # Executor Python workers must be able to import chdb_spark: UDF
    # closures (pandas_udf / mapInPandas kernels in multimodal.py,
    # operators/) reference module-level helpers, which cloudpickle
    # serializes BY REFERENCE — the worker then imports the module. A
    # driver process launched from outside the repo (sys.path patched
    # in-process only) would otherwise fail with ModuleNotFoundError on
    # the first UDF task. Exporting the package parent on PYTHONPATH
    # BEFORE the JVM starts covers local mode (workers inherit the
    # driver's env); cluster deployments ship the package via --py-files
    # / pex as usual.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + pp if pp else "")
        )
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    merged = dict(DEFAULT_CONFS)
    shuffle_parts = _derived_shuffle_partitions(master)
    if shuffle_parts is not None:
        merged["spark.sql.shuffle.partitions"] = str(shuffle_parts)
    if confs:
        merged.update(confs)
    for k, v in merged.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark


#: Alias mirroring the reference's ``chdb.connect()`` naming.
connect = get_spark


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Register every parquet table under ``sf_dir`` as a temp view.

    Spark analogue of chDB's ``file()`` table function + session catalog
    (reference datastore/table_functions.py:123 FileTableFunction).
    Parquet scans get predicate pushdown + column pruning from Catalyst.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = read_table(spark, path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# Catalog-style metadata cache for read_table: building a parquet
# DataFrame costs ~100 ms on the DRIVER (file listing + footer schema
# inference) before any job runs — per-query re-derivation of the same
# table is pure overhead, and every real engine (chDB's session catalog,
# DuckDB's catalog, a production Spark metastore) resolves a table's
# metadata once, not per statement. Entries are keyed by (application,
# absolute path, mtime_ns, size) so an overwritten file/dir misses the
# cache and re-derives; the returned DataFrame is an immutable logical
# plan, safe to share across callers. Bounded LRU: a stopped session's
# plans age out.
_READ_TABLE_CACHE: dict = {}
_READ_TABLE_CACHE_MAX = 64


def _path_fingerprint(path: str):
    """(n_files, total_size, max_mtime_ns) over ``path``.

    A regular file fingerprints as itself. A directory is walked
    recursively — the top-level stat alone is NOT enough: rewriting files
    inside a partition subdirectory leaves the parent dir's mtime/size
    unchanged, which would serve a stale cached plan (old file listing).
    Walks larger than ``_FINGERPRINT_MAX_FILES`` return None (caller skips
    the cache): past that point the walk costs as much as the listing the
    cache was saving."""
    st = os.stat(path)
    if not os.path.isdir(path):
        return (1, st.st_size, st.st_mtime_ns)
    n, total, max_mtime = 0, 0, st.st_mtime_ns
    stack = [path]
    while stack:
        d = stack.pop()
        with os.scandir(d) as it:
            for entry in it:
                est = entry.stat(follow_symlinks=False)
                max_mtime = max(max_mtime, est.st_mtime_ns)
                if entry.is_dir(follow_symlinks=False):
                    stack.append(entry.path)
                else:
                    n += 1
                    total += est.st_size
                if n > _FINGERPRINT_MAX_FILES:
                    return None
    return (n, total, max_mtime)


_FINGERPRINT_MAX_FILES = 4096


def _read_table_key(spark: SparkSession, path: str):
    try:
        # Not just OSError: under Spark Connect, touching sparkContext
        # raises a PySpark exception — a session type read_table tolerates
        # below (the conf.set fallback), so it must not crash the cache key.
        app_id = spark.sparkContext.applicationId
    except Exception:
        return None  # no stable session identity: skip the cache
    fp = _path_fingerprint(path)
    if fp is None:
        return None
    return (app_id, os.path.abspath(path)) + fp


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table, restoring TIMESTAMP(NANOS) columns.

    With ``nanosAsLong`` set, parquet nano-timestamps surface as long
    nanoseconds-since-epoch; they are converted back to TimestampType with
    *integer* division (``div 1000`` → µs) — float division would lose
    precision above 2^53 ns. Pure Column math, stays in codegen.
    """
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    try:
        key = _read_table_key(spark, path)
    except OSError:
        key = None  # nonexistent/odd path: let spark.read raise its error
    except Exception:
        key = None  # any other stat/walk surprise: uncached, never wrong
    if key is not None:
        hit = _READ_TABLE_CACHE.pop(key, None)
        if hit is not None:
            _READ_TABLE_CACHE[key] = hit  # re-insert: LRU recency
            return hit

    # Driver-session-proof: callers may hand us a SparkSession built without
    # DEFAULT_CONFS (e.g. an external harness). nanosAsLong is runtime-settable,
    # and without it any parquet with TIMESTAMP(NANOS) columns fails the scan
    # with PARQUET_TYPE_ILLEGAL. Set it here, right before the read.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf locked down (e.g. spark-connect policy) — fall through
    df = spark.read.parquet(path)
    try:
        arrow_schema = list(pq.read_schema(path))
    except Exception:
        arrow_schema = []  # directory path: schema already Spark-merged
    for fld in arrow_schema:
        t = str(fld.type)
        if t.startswith("timestamp[ns") and dict(df.dtypes).get(fld.name) == "bigint":
            df = df.withColumn(fld.name, F.expr(f"timestamp_micros(`{fld.name}` div 1000)"))
    if key is not None:
        _READ_TABLE_CACHE[key] = df
        while len(_READ_TABLE_CACHE) > _READ_TABLE_CACHE_MAX:
            _READ_TABLE_CACHE.pop(next(iter(_READ_TABLE_CACHE)))
    return df


def _caller_namespace() -> dict:
    """Variables visible to ``Python(var)`` table functions — the first
    stack frame outside this package (the reference engine inspects the
    caller's frame the same way for its ``Python()`` source,
    datastore/table_functions.py:1143)."""
    import inspect

    pkg = __name__.split(".")[0]
    for frame_info in inspect.stack()[1:]:
        mod = frame_info.frame.f_globals.get("__name__", "")
        if not mod.startswith(pkg):
            ns = dict(frame_info.frame.f_globals)
            ns.update(frame_info.frame.f_locals)
            return ns
    return {}


class QueryResult(str):
    """Text query result with the reference's metrics surface
    (docs/utils.rst:252-262: ``rows_read()/bytes_read()/elapsed()`` on the
    object ``chdb.query`` returns). It IS the rendered string (a ``str``
    subclass), so every existing text consumer keeps working; the metrics
    ride along.

    Divergence, documented: the reference counts storage rows/bytes read by
    the engine; Spark reports scan metrics through its listener bus per
    job, not per result — so ``rows_read``/``bytes_read`` here report the
    *result* rows and rendered bytes, the numbers a progress display needs.
    """

    def __new__(cls, text: str, elapsed: float = 0.0, rows: int = 0):
        obj = super().__new__(cls, text)
        obj._elapsed = elapsed
        obj._rows = rows
        return obj

    def bytes(self) -> bytes:
        return self.encode()

    def data(self) -> str:
        return str(self)

    def rows_read(self) -> int:
        return self._rows

    def bytes_read(self) -> int:
        return len(self.encode())

    def storage_rows_read(self) -> int:
        return self._rows

    def storage_bytes_read(self) -> int:
        return len(self.encode())

    def elapsed(self) -> float:
        return self._elapsed

    def has_error(self) -> bool:
        return False

    def error_message(self) -> str:
        return ""

    def show(self) -> None:
        print(self)


def _apply_with_fill(spark: SparkSession, df: DataFrame, spec: dict) -> DataFrame:
    """Apply a ClickHouse ``ORDER BY … WITH FILL`` spec to a result frame.

    Generates the key sequence (FROM inclusive → TO exclusive, STEP; with no
    bounds, the observed min..max inclusively — the CH contract), full-outer
    joins it with the result so out-of-range original rows survive, and
    fills the gap rows with column defaults (0 / '' — CH columns are
    non-Nullable, so defaults are what CH emits for fill rows).

    Scale shape: the generated frame is |range|/step rows from
    ``spark.range``/``sequence`` (no driver materialization); the join is a
    plain equi-join AQE broadcasts when small. The only driver hop is the
    1-row min/max lookup when bounds are omitted.
    """
    from pyspark.sql import functions as F

    key = spec["key"]
    key_col = next((c for c in df.columns if c.lower() == key.lower()), None)
    if key_col is None:
        raise ChdbError(f"WITH FILL key {key!r} is not an output column: {df.columns}")
    dtype = dict(df.dtypes)[key_col]
    step = spec["step"]
    lo, hi = spec["from"], spec["to"]
    to_exclusive = hi is not None
    if lo is None or hi is None:
        row = df.agg(F.min(key_col).alias("lo"), F.max(key_col).alias("hi")).first()
        if row["lo"] is None:
            return df  # empty result: nothing to fill
        lo = lo if lo is not None else row["lo"]
        hi = hi if hi is not None else row["hi"]
        to_exclusive = to_exclusive and hi == spec["to"]

    # DESC fill runs FROM(high) → TO(low): sequence needs a negative step
    if isinstance(lo, (int, float)) and isinstance(hi, (int, float)) and lo > hi:
        step = -abs(step)
    if dtype in ("date",):
        seq = F.sequence(
            F.to_date(F.lit(str(lo))),
            F.to_date(F.lit(str(hi))),
            F.expr(f"interval {int(step)} day"),
        )
    elif dtype.startswith("timestamp"):
        seq = F.sequence(
            F.to_timestamp(F.lit(str(lo))),
            F.to_timestamp(F.lit(str(hi))),
            F.expr(f"interval {int(step)} second"),
        )
    else:
        seq = F.sequence(F.lit(lo), F.lit(hi), F.lit(step))
    frame = (
        spark.range(1)
        .select(F.explode(seq).alias(key_col))
        .select(F.col(key_col).cast(dtype))
    )
    if to_exclusive:
        frame = frame.filter(
            F.col(key_col) > F.lit(hi)
            if isinstance(step, (int, float)) and step < 0
            else F.col(key_col) < F.lit(hi)
        )
    filled = frame.join(df, key_col, "full_outer")
    order = F.col(key_col).desc() if spec["desc"] else F.col(key_col).asc()
    interp = []
    for want in spec.get("interpolate", []):
        c = next((x for x in df.columns if x.lower() == want.lower()), None)
        if c is None:
            raise ChdbError(f"INTERPOLATE column {want!r} is not an output column")
        interp.append(c)
    if interp:
        # CH INTERPOLATE (col): fill rows carry the previous row's value
        # forward (in fill direction). The window is global but bounded by
        # the fill frame (a report-shaped result, not corpus rows).
        from pyspark.sql.window import Window

        w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
        for c in interp:
            filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    num = {
        c: 0
        for c, t in filled.dtypes
        if c != key_col
        and c not in interp
        and (t in ("int", "bigint", "smallint", "tinyint", "double", "float") or t.startswith("decimal"))
    }
    txt = [c for c, t in filled.dtypes if c != key_col and c not in interp and t == "string"]
    if num:
        filled = filled.na.fill(num)
    if txt:
        filled = filled.na.fill("", subset=txt)
    return filled.select(df.columns).orderBy(order)


def query(
    spark_or_sql,
    sql_or_fmt: str | None = None,
    output_format: str | None = None,
    params: dict | None = None,
    path: str = "",
    udf_path: str = "",
    options: dict | None = None,
    progress_callback=None,
):
    """One-shot SQL — the analogue of ``chdb.query(sql, output_format,
    path=..., udf_path=..., params=...)`` (reference chdb/__init__.py:
    145-217). Two call shapes:

    * Reference shape — ``query("SELECT 1", "Pretty")``: the tuned shared
      SparkSession is created/fetched implicitly, ``output_format``
      defaults to "CSV" exactly like the reference, ``path`` routes
      through a stateful ``Session(path)`` (persisted DDL), ``udf_path``
      loads a UDF script directory first.
    * Spark shape — ``query(spark, "SELECT 1")``: explicit session,
      default format "DataFrame" (a lazy DataFrame, like the reference's
      lazy result objects).

    Format names ("Pretty", "CSV", "JSONEachRow", "Arrow", …) render the
    collected result — see chdb_spark.formats. ``params`` binds
    ``{key:Type}`` placeholders (chdb_spark.params). ``options`` (reference:
    ClickHouse startup arguments) accepts the documented keys for drop-in
    signature parity: ``udf_path`` loads a UDF dir; everything else
    (verbose/log-level/progress/max_threads) configures engine startup the
    Spark session already owns, and is accepted as a no-op.
    """
    if options and options.get("udf_path") and not udf_path:
        udf_path = options["udf_path"]
    from chdb_spark.formats import format_result
    from chdb_spark.params import bind_params

    if isinstance(spark_or_sql, str):
        sql_text = spark_or_sql
        fmt = sql_or_fmt if sql_or_fmt is not None else (output_format or "CSV")
        if path:
            from chdb_spark.stateful import Session

            sess = Session(path)
            try:
                if udf_path:
                    from chdb_spark.udf import load_udf_path

                    load_udf_path(sess.spark, udf_path)
                return sess.query(sql_text, fmt=fmt, params=params)
            finally:
                sess.close()  # file-backed state persists (reference contract)
        spark = get_spark()
        if udf_path:
            from chdb_spark.udf import load_udf_path

            load_udf_path(spark, udf_path)
        reference_shape = True
    else:
        spark = spark_or_sql
        sql_text = sql_or_fmt
        fmt = output_format or "DataFrame"
        reference_shape = False

    # ClickHouse dialect: a trailing `FORMAT <Name>` in the SQL text wins
    # over the argument (reference behavior — the engine honors the clause)
    from chdb_spark.dialect import resolve_table_functions, rewrite
    from chdb_spark.formats import split_format_suffix

    sql_text, suffix_fmt = split_format_suffix(sql_text)
    if suffix_fmt is not None:
        fmt = suffix_fmt
    # CH `EXISTS [TABLE] name` → UInt8 1/0 (public CH statement; needs the
    # catalog, so it can't be a pure-text dialect rewrite)
    m_exists = re.match(
        r"^\s*EXISTS\s+(?:TABLE\s+)?([`\w.]+)\s*;?\s*$", sql_text, re.IGNORECASE
    )
    if m_exists:
        name = m_exists.group(1).replace("`", "")
        try:
            found = spark.catalog.tableExists(name)
        except Exception:
            found = False
        sql_text = f"SELECT CAST({1 if found else 0} AS TINYINT) AS result"
    if fmt == "Debug":  # reference: Debug = CSV + verbose engine logging
        fmt = "CSV"
    if reference_shape and fmt in ("DataFrame", "dataframe"):
        # reference chdb.query(sql, "DataFrame") returns a *pandas* frame
        # (chdb/__init__.py:205 query_df); the lazy Spark DataFrame is the
        # Spark-call-shape default only
        fmt = "Pandas"
    try:
        bound = bind_params(sql_text, params)
        # CH `INSERT INTO [TABLE] FUNCTION target(...) SELECT …`
        # (reference core.py:5502): run the SELECT through this same
        # pipeline, dispatch the write to the target (file / url / remote
        # / jar-free deltaLake / iceberg), return an empty status result.
        from chdb_spark.dialect import handle_insert_table_function

        if handle_insert_table_function(
            bound, lambda s: query(spark, s, "DataFrame")
        ):
            return format_result(
                spark.sql("SELECT '' AS status WHERE false"), fmt
            )
        # CH-dialect acceptance (reference chdb/__init__.py:145-217 — every
        # README example is CH SQL): rewrite CH function names/clauses onto
        # Spark SQL, then materialize file()/url()/Python() table functions
        # as temp views. Pure Spark SQL passes through unchanged.
        from chdb_spark.dialect import extract_settings

        bound, ch_settings = extract_settings(bound)
        from chdb_spark.dialect import extract_with_fill

        bound, fill_spec = extract_with_fill(bound)
        translated = rewrite(bound)
        if "__system_" in translated:
            from chdb_spark.dialect import resolve_system_tables

            resolve_system_tables(spark, translated)
        from chdb_spark.dialect import _TF_RE

        if _TF_RE.search(translated):
            translated = resolve_table_functions(
                spark, translated, namespace=_caller_namespace()
            )
        if re.search(r"\bASOF\s+(LEFT\s+)?JOIN\b", translated, re.IGNORECASE):
            from chdb_spark.dialect import resolve_asof_join

            translated = resolve_asof_join(spark, translated)
        if re.search(r"\bANY\s+(LEFT\s+|INNER\s+|RIGHT\s+)?JOIN\b"
                     r"|\b(LEFT|INNER|RIGHT)\s+ANY\s+JOIN\b",
                     translated, re.IGNORECASE):
            from chdb_spark.dialect import resolve_any_join

            translated = resolve_any_join(spark, translated)
        out = spark.sql(translated)
        if fill_spec is not None:
            out = _apply_with_fill(spark, out, fill_spec)
        if progress_callback is not None:
            # completion-style progress (reference api-reference.md:190:
            # progress objects carry read_rows/read_bytes). Spark reports
            # per-job metrics through its listener bus, not a per-row pull
            # — so the callback fires once with the final counts, which is
            # what a progress bar needs to terminate correctly.
            import time as _time
            from types import SimpleNamespace

            t0 = _time.perf_counter()
            rendered = format_result(out, fmt, settings=ch_settings)
            if fmt == "DataFrame":
                n_rows = rendered.count()
            elif isinstance(rendered, str):
                n_rows = rendered.count("\n")
            elif hasattr(rendered, "num_rows"):  # pyarrow Table
                n_rows = rendered.num_rows
            elif hasattr(rendered, "__len__") and not isinstance(rendered, bytes):
                n_rows = len(rendered)
            else:
                n_rows = 0
            progress_callback(
                SimpleNamespace(
                    read_rows=n_rows,
                    read_bytes=0,
                    total_rows_to_read=n_rows,
                    elapsed=_time.perf_counter() - t0,
                )
            )
            return rendered
        import time as _time

        t0 = _time.perf_counter()
        rendered = format_result(out, fmt, settings=ch_settings)
        elapsed = _time.perf_counter() - t0
        from chdb_spark.utils import trace as _trace

        if _trace.enabled or (reference_shape and isinstance(rendered, str)):
            n_rows = rendered.count("\n") if isinstance(rendered, str) else (
                rendered.count() if fmt == "DataFrame" else len(rendered)
                if hasattr(rendered, "__len__") and not isinstance(rendered, bytes)
                else 0
            )
            _trace._record(sql_text, elapsed, n_rows)
            if reference_shape and isinstance(rendered, str):
                return QueryResult(rendered, elapsed=elapsed, rows=n_rows)
        return rendered
    except Exception as exc:
        if reference_shape and not isinstance(exc, (ValueError, KeyError)):
            raise ChdbError(str(exc)) from exc
        raise


#: ``chdb.sql`` is an alias of ``chdb.query`` (reference chdb/__init__.py:220).
sql = query


def databases(spark: SparkSession) -> list[str]:
    """List catalog databases (reference ``DataStore.databases()``,
    datastore/core.py:7712)."""
    return [db.name for db in spark.catalog.listDatabases()]


def tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """List tables + temp views (reference ``DataStore.tables()``,
    datastore/core.py:7733)."""
    return [t.name for t in spark.catalog.listTables(database)]


def use_database(spark: SparkSession, name: str) -> None:
    """Switch current database (reference ``use_database``,
    datastore/core.py:7675). Creates it if missing, mirroring the
    reference's Atomic-DB auto-create on Session paths."""
    if not spark.catalog.databaseExists(name):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS `{name}`")
    spark.catalog.setCurrentDatabase(name)


def __getattr__(name: str):
    """``chdb_spark.session.Session`` resolves to the stateful Session —
    the reference's ``chdb.session.Session`` lives in a module of the same
    name, so a drop-in import path keeps working (PEP 562 lazy alias;
    eager import would be circular)."""
    if name == "Session":
        from chdb_spark.stateful import Session

        return Session
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
