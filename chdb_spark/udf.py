"""Python UDF surface — the Spark analogue of ``chdb.udf.chdb_udf``.

Reference semantics (SURVEY.md §2.10; reference docs/udf.rst:26-60,
examples/udf.py:1-10, chdb/__init__.py:227-231):

- ``@chdb_udf(return_type="UInt64")`` declares a stateless scalar Python
  function callable from SQL; default return type is ``String``.
- Every input argument arrives as a **string** (the engine feeds the UDF
  process TabSeparated lines); the function converts as needed.
- Imports go inside the function body (the reference pickles the source into
  a standalone script); we keep that convention working but don't require it.
- Module-level ``create_function`` / ``drop_function`` and the
  ``NullHandling`` / ``ExceptionHandling`` knobs (chdb/__init__.py:227-231).

Spark-first execution: instead of one OS process per UDF fed line-by-line
(the reference model), each UDF is registered as an **Arrow-batched
pandas_udf** — inputs cross JVM→Python as columnar batches, the row loop
runs over a batch in one Python worker call, and the declared ClickHouse
return type maps onto a real Spark type (``ch_type_to_spark``). This keeps
the reference's contract (string inputs, typed output) while being
vectorized at the transfer layer — the 10-100× difference the scale notes
call out. UDFs remain the slow path; the function registry
(``chdb_spark.functions``) is where hot-path expressions live.
"""

from __future__ import annotations

import enum
import functools
import re
from typing import Any, Callable

import pandas as pd

__all__ = [
    "chdb_udf",
    "chdb_udaf",
    "chdb_udtf",
    "create_function",
    "drop_function",
    "register_udfs",
    "load_udf_path",
    "ch_type_to_spark",
    "NullHandling",
    "ExceptionHandling",
    "ChdbUDF",
]


class NullHandling(enum.Enum):
    """What a NULL input does (analogue of chdb-core's NullHandling)."""

    #: NULL in → NULL out, function body never sees the row (default).
    PROPAGATE = "propagate"
    #: Function is called with ``None`` for NULL inputs.
    CALL = "call"


class ExceptionHandling(enum.Enum):
    """What a raising UDF body does (analogue of chdb-core's ExceptionHandling)."""

    #: Exception propagates and fails the query (default — loud, like Spark).
    RAISE = "raise"
    #: Exception is swallowed; the row yields NULL.
    NULL = "null"


_SIMPLE_CH_TO_SPARK = {
    "string": "string",
    "fixedstring": "string",
    "uuid": "string",
    "ipv4": "string",
    "ipv6": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    # Unsigned widths promote one level; UInt64 → Decimal(20,0) documents the
    # overflow divergence (SURVEY §1.3).
    "uint8": "smallint",
    "uint16": "int",
    "uint32": "bigint",
    "uint64": "decimal(20,0)",
    "float32": "float",
    "float64": "double",
    "date": "date",
    "date32": "date",
    "datetime": "timestamp",
    "datetime64": "timestamp",
}


def ch_type_to_spark(ch_type: str) -> str:
    """Map a ClickHouse type string to a Spark SQL type string.

    Covers the families the reference UDF docs use: scalars, Decimal(p,s),
    Decimal32/64/128(s), Array(T), Nullable(T), Map(K,V), FixedString(n),
    DateTime64(p). Nullable is a no-op (every Spark field is nullable).
    """
    s = ch_type.strip()
    m = re.match(r"^Nullable\((.*)\)$", s, re.IGNORECASE)
    if m:
        return ch_type_to_spark(m.group(1))
    m = re.match(r"^LowCardinality\((.*)\)$", s, re.IGNORECASE)
    if m:
        return ch_type_to_spark(m.group(1))
    m = re.match(r"^Array\((.*)\)$", s, re.IGNORECASE)
    if m:
        return f"array<{ch_type_to_spark(m.group(1))}>"
    m = re.match(r"^Map\((.*),(.*)\)$", s, re.IGNORECASE)
    if m:
        return (
            f"map<{ch_type_to_spark(m.group(1))},{ch_type_to_spark(m.group(2))}>"
        )
    m = re.match(r"^Decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$", s, re.IGNORECASE)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    m = re.match(r"^Decimal(32|64|128)\(\s*(\d+)\s*\)$", s, re.IGNORECASE)
    if m:
        prec = {"32": 9, "64": 18, "128": 38}[m.group(1)]
        return f"decimal({prec},{m.group(2)})"
    m = re.match(r"^FixedString\(\s*\d+\s*\)$", s, re.IGNORECASE)
    if m:
        return "string"
    m = re.match(r"^DateTime64\(\s*\d+\s*\)$", s, re.IGNORECASE)
    if m:
        return "timestamp"
    base = _SIMPLE_CH_TO_SPARK.get(s.lower())
    if base is None:
        raise ValueError(f"unsupported ClickHouse return type for UDF: {ch_type!r}")
    return base


#: name → ChdbUDF for everything decorated in this interpreter.
_REGISTRY: dict[str, "ChdbUDF"] = {}


class ChdbUDF:
    """A declared scalar Python UDF.

    Calling the object with plain Python values runs the body directly
    (the reference's local-testing pattern, docs/udf.rst "Testing UDFs
    Locally"). ``register(spark)`` exposes it to ``spark.sql`` under its
    name; ``column(*cols)`` builds a DataFrame Column invocation.
    """

    def __init__(
        self,
        fn: Callable[..., Any],
        return_type: str = "String",
        name: str | None = None,
        null_handling: NullHandling = NullHandling.PROPAGATE,
        exception_handling: ExceptionHandling = ExceptionHandling.RAISE,
    ):
        self.fn = fn
        self.name = name or fn.__name__
        self.ch_return_type = return_type
        self.spark_return_type = ch_type_to_spark(return_type)
        self.null_handling = null_handling
        self.exception_handling = exception_handling
        functools.update_wrapper(self, fn)

    def __call__(self, *args: Any) -> Any:
        return self.fn(*args)

    # -- Spark integration ------------------------------------------------
    def _batch_fn(self) -> Callable[..., "pd.Series"]:
        fn = self.fn
        propagate = self.null_handling is NullHandling.PROPAGATE
        null_on_error = self.exception_handling is ExceptionHandling.NULL
        stringly = self.spark_return_type in ("string",)

        def run_batch(*cols: pd.Series) -> pd.Series:
            if not cols:  # zero-arg UDF: pandas_udf still hands us an index
                raise AssertionError("zero-arg UDFs use the iterator path")
            n = len(cols[0])
            # Reference contract: arguments are strings (TabSeparated lines,
            # docs/udf.rst "Input Arguments"). NULLs stay None.
            as_str = [
                c.map(lambda v: None if pd.isna(v) else str(v)) for c in cols
            ]
            out: list[Any] = []
            for i in range(n):
                row = [s.iloc[i] for s in as_str]
                if propagate and any(v is None for v in row):
                    out.append(None)
                    continue
                try:
                    res = fn(*row)
                except Exception:
                    if null_on_error:
                        res = None
                    else:
                        raise
                if stringly and res is not None:
                    res = str(res)
                out.append(res)
            return pd.Series(out, dtype="object")

        return run_batch

    def register(self, spark) -> None:
        """Register for SQL + DataFrame use under ``self.name``."""
        from pyspark.sql.functions import pandas_udf

        spark.udf.register(
            self.name, pandas_udf(self._batch_fn(), self.spark_return_type)
        )

    def column(self, *cols):
        """Invoke as a Column expression: ``my_udf.column(F.col("a"), ...)``.

        Requires prior :meth:`register` (or ``create_function``) on the
        active session — invocation goes through ``F.call_udf`` so SQL and
        DataFrame callers share one registration.
        """
        from pyspark.sql import functions as F

        return F.call_udf(self.name, *cols)

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"ChdbUDF({self.name}, return_type={self.ch_return_type})"


def chdb_udf(
    return_type: str = "String",
    *,
    name: str | None = None,
    null_handling: NullHandling = NullHandling.PROPAGATE,
    exception_handling: ExceptionHandling = ExceptionHandling.RAISE,
) -> Callable[[Callable[..., Any]], ChdbUDF]:
    """Decorator declaring a scalar Python UDF (reference docs/udf.rst:26-60).

    >>> @chdb_udf(return_type="UInt64")
    ... def calculate_total(price, quantity):
    ...     return int(price) * int(quantity)

    The decorated object is callable locally, and after
    ``create_function(spark)`` usable from ``spark.sql`` by name.
    """

    def deco(fn: Callable[..., Any]) -> ChdbUDF:
        udf_obj = ChdbUDF(
            fn,
            return_type=return_type,
            name=name,
            null_handling=null_handling,
            exception_handling=exception_handling,
        )
        _REGISTRY[udf_obj.name] = udf_obj
        return udf_obj

    return deco


def create_function(spark, fn: ChdbUDF | Callable[..., Any] | str) -> ChdbUDF:
    """Register one UDF on a session (reference chdb/__init__.py:227-231).

    Accepts a ``ChdbUDF`` (from ``@chdb_udf``), a plain callable (wrapped
    with the String default), or the name of an already-declared UDF.
    """
    if isinstance(fn, str):
        udf_obj = _REGISTRY[fn]
    elif isinstance(fn, ChdbUDF):
        udf_obj = fn
    else:
        udf_obj = chdb_udf()(fn)
    udf_obj.register(spark)
    return udf_obj


def drop_function(spark, name: str) -> None:
    """Unregister from SQL and forget the declaration."""
    _REGISTRY.pop(name, None)
    try:
        spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS `{name}`")
    except Exception:
        pass


def register_udfs(spark) -> list[str]:
    """Register every UDF declared so far; returns their names."""
    for udf_obj in _REGISTRY.values():
        udf_obj.register(spark)
    return sorted(_REGISTRY)


def chdb_udaf(return_type: str = "Float64", *, name: str | None = None):
    """Aggregate-function decorator (SURVEY §2.10: the reference exposes no
    Python UDAF — engine-side -State/-Merge combinators only; Spark's
    GROUPED_AGG pandas_udf provides the superset here).

    The function receives one pandas Series per argument for a whole group
    (Arrow-batched) and returns one scalar:

    >>> @chdb_udaf(return_type="Float64")
    ... def geo_mean(v):
    ...     import numpy as np
    ...     return float(np.exp(np.log(v[v > 0]).mean()))
    >>> geo_mean.register(spark)
    >>> df.groupBy("k").agg(geo_mean.column(F.col("v")))

    Partial aggregation note: GROUPED_AGG evaluates once per group after a
    full shuffle of the group's rows (no map-side combine) — fine for
    bounded groups, the documented slow path otherwise; prefer registry
    aggregates for hot paths.
    """

    def deco(fn: Callable[..., Any]):
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.functions import PandasUDFType

        spark_type = ch_type_to_spark(return_type)
        agg = pandas_udf(fn, spark_type, PandasUDFType.GROUPED_AGG)
        fn_name = name or fn.__name__

        def register(spark):
            spark.udf.register(fn_name, agg)
            return agg

        def column(*cols):
            return agg(*cols)

        agg_obj = agg
        agg_obj.register = register
        agg_obj.column = column
        agg_obj.name = fn_name
        return agg_obj

    return deco


def chdb_udtf(schema: str | dict[str, str], *, name: str | None = None):
    """Table-function decorator — the analogue of the reference's
    UDTF surface (SURVEY §2.10: ``PyReader`` + ``Python()`` table function,
    reference chdb/__init__.py:222, cc_extension.py:1-17) on Spark 4's
    native Python UDTF.

    ``schema`` is either a Spark DDL string (``"word string, n int"``) or a
    mapping of column → ClickHouse type string (translated via
    ``ch_type_to_spark``). The decorated class must define ``eval(self,
    *args)`` yielding tuples; ``register(spark)`` exposes it to SQL:

    >>> @chdb_udtf({"word": "String", "n": "UInt32"})
    ... class SplitWords:
    ...     def eval(self, text: str):
    ...         for w in (text or "").split():
    ...             yield (w, len(w))
    >>> SplitWords.register(spark)
    >>> spark.sql("SELECT * FROM split_words('a bb ccc')")
    """
    from pyspark.sql.functions import udtf as _udtf

    if isinstance(schema, dict):
        ddl = ", ".join(f"{k} {ch_type_to_spark(v)}" for k, v in schema.items())
    else:
        ddl = schema

    def deco(cls):
        wrapped = _udtf(cls, returnType=ddl)
        fn_name = name or re.sub(r"(?<!^)(?=[A-Z])", "_", cls.__name__).lower()

        def register(spark):
            spark.udtf.register(fn_name, wrapped)
            return wrapped

        wrapped.register = register
        wrapped.name = fn_name
        return wrapped

    return deco


def load_udf_path(spark, udf_path: str) -> list[str]:
    """Import ``*.py`` files from a directory and register the UDFs they
    declare — the analogue of the reference's ``udf_path`` query option
    (chdb/__init__.py:162-169: UDF scripts live in a directory the engine
    scans at query time).
    """
    import pathlib
    import runpy

    before = set(_REGISTRY)
    for path in sorted(pathlib.Path(udf_path).glob("*.py")):
        runpy.run_path(str(path))
    new = sorted(set(_REGISTRY) - before)
    for nm in new:
        _REGISTRY[nm].register(spark)
    return new


#: reference alias (chdb/__init__.py:240 ``from .udf import func``) — the
#: upstream decorator name for @chdb_udf
func = chdb_udf
