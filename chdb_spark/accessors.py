"""Accessor namespaces — ``.str`` / ``.dt`` / ``.arr`` / ``.json`` / ``.url``
/ ``.ip`` / ``.geo`` on column expressions (SURVEY §2.8: the reference
surfaces its function registry three ways — accessors, expression methods,
and the F namespace; reference datastore/accessors/*.py, base class
accessors/base.py:14).

Spark-first: :class:`ColumnExpr` IS a ``pyspark.sql.Column`` (subclass), so
everything composes with the DataFrame API unchanged; accessor methods
resolve through the function registry (798 Column-builder entries), which
means every call stays a JVM-side Column expression — the accessor layer
adds zero execution surface, only naming.

    ds["name"].str.upper()
    ds["ts"].dt.year            # property, like pandas
    ds["text"].str.split()[0]   # 0-based indexing into the split array
    ds["payload"].json.extract_string("k")
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from chdb_spark.functions import registry

# The importable pyspark.sql.Column is a facade over classic/connect
# implementations; subclass the classic one (this repo runs classic local/
# cluster mode) so the jc-based constructor works and isinstance(...,
# pyspark.sql.Column) stays true.
from pyspark.sql.classic.column import Column as _ClassicColumn


class ColumnExpr(_ClassicColumn):
    """A pyspark Column with the reference's accessor namespaces."""

    def __init__(self, col: Column):
        super().__init__(col._jc)

    @property
    def str(self) -> "StringAccessor":
        return StringAccessor(self)

    @property
    def dt(self) -> "DateTimeAccessor":
        return DateTimeAccessor(self)

    @property
    def arr(self) -> "ArrayAccessor":
        return ArrayAccessor(self)

    @property
    def json(self) -> "JsonAccessor":
        return JsonAccessor(self)

    @property
    def url(self) -> "UrlAccessor":
        return UrlAccessor(self)

    @property
    def ip(self) -> "IpAccessor":
        return IpAccessor(self)

    @property
    def geo(self) -> "GeoAccessor":
        return GeoAccessor(self)


def wrap(col: Column) -> ColumnExpr:
    return col if isinstance(col, ColumnExpr) else ColumnExpr(col)


class BaseAccessor:
    """Resolves attribute access through the function registry
    (reference accessors/base.py:14-60: accessor = namespace whose methods
    build Function expressions with the wrapped column as first arg).

    Subclasses define ``_aliases`` (pandas-style name → reference name) and
    ``_properties`` (attributes that evaluate immediately, like ``dt.year``).
    Unknown names fall through to the registry verbatim, so every reference
    function in the category is reachable.
    """

    _aliases: dict[str, str] = {}
    _properties: dict[str, str] = {}

    def __init__(self, col: Column):
        self._col = col

    def _call(self, name: str, *args: Any) -> ColumnExpr:
        if not registry.has(name):
            raise AttributeError(f"no registered function {name!r}")
        return wrap(registry.get(name)(self._col, *args))

    def __getattr__(self, item: str):
        if item.startswith("_"):
            raise AttributeError(item)
        if item in self._properties:
            return self._call(self._properties[item])
        target = self._aliases.get(item, item)
        if not registry.has(target):
            raise AttributeError(
                f"{type(self).__name__} has no function {item!r} "
                f"(not in registry as {target!r})"
            )

        def invoke(*args: Any) -> ColumnExpr:
            return self._call(target, *args)

        invoke.__name__ = item
        return invoke


class StringAccessor(BaseAccessor):
    """``.str`` — reference accessors/string.py:16. 0-based ``[i]`` indexing
    and ``[a:b]`` slicing map to substring (pandas compatibility, reference
    string.py:34-100)."""

    _aliases = {
        # registry `length` is the ClickHouse array/string polymorphic size;
        # in the .str namespace it must be character length
        "len": "char_length",
        "length": "char_length",
        "strip": "trimBoth",
        "lstrip": "trimLeft",
        "rstrip": "trimRight",
        "split": "splitByString",
        "replace": "replaceAll",
        "find": "position",
        "startswith": "startsWith",
        "endswith": "endsWith",
        "contains": "countSubstrings",
        "title": "initcap",
        "pad": "leftPad",
        "ljust": "rightPad",
        "rjust": "leftPad",
        "slice": "substring",
        "cat": "concat",
    }

    def split(self, sep: str = " ") -> ColumnExpr:
        # ClickHouse arg order is splitByString(separator, s)
        return wrap(registry.get("splitByString")(sep, self._col))

    def __getitem__(self, index):
        if isinstance(index, slice):
            if index.step not in (None, 1):
                raise ValueError("string slicing with step is not supported")
            start = index.start or 0
            if start < 0:
                length = None if index.stop is None else index.stop - start
                base = F.substring(self._col, start, 1 << 30)
            else:
                base = F.substring(
                    self._col,
                    start + 1,
                    (1 << 30) if index.stop is None else max(index.stop - start, 0),
                )
            return wrap(base)
        # integer index into an array result (e.g. .str.split().str[0]);
        # reference accepts 0-based and maps onto 1-based arrayElement
        idx = index + 1 if index >= 0 else index
        return wrap(F.element_at(self._col, idx))


class DateTimeAccessor(BaseAccessor):
    """``.dt`` — reference accessors/datetime.py:16 (properties at :34-105)."""

    _properties = {
        "year": "toYear",
        "month": "toMonth",
        "day": "toDayOfMonth",
        "hour": "toHour",
        "minute": "toMinute",
        "second": "toSecond",
        "quarter": "toQuarter",
        "dayofweek": "toDayOfWeek",
        "day_of_week": "toDayOfWeek",
        "dayofyear": "toDayOfYear",
        "day_of_year": "toDayOfYear",
        "week": "toWeek",
        "weekofyear": "toWeek",
        "date": "toDate",
    }
    _aliases = {
        "strftime": "formatDateTime",
        "floor": "toStartOfInterval",
        "truncate": "date_trunc",
    }

    def strftime(self, fmt: str) -> ColumnExpr:
        return self._call("formatDateTime", fmt)

    def normalize(self) -> ColumnExpr:
        """Midnight-truncate (pandas ``dt.normalize``) — date_trunc to day."""
        return wrap(F.date_trunc("day", self._col))

    def tz_localize(self, tz: str) -> ColumnExpr:
        """Interpret naive timestamps as wall-clock in ``tz`` (pandas
        ``dt.tz_localize``). Spark timestamps are session-zone-naive, so
        this is ``to_utc_timestamp`` — the instant is shifted to UTC;
        Spark carries no per-value zone annotation (documented divergence)."""
        return wrap(F.to_utc_timestamp(self._col, tz))

    def tz_convert(self, tz: str) -> ColumnExpr:
        """Render UTC instants as wall-clock in ``tz`` (pandas
        ``dt.tz_convert``) — ``from_utc_timestamp``."""
        return wrap(F.from_utc_timestamp(self._col, tz))


class ArrayAccessor(BaseAccessor):
    """``.arr`` — reference accessors/array.py:16."""

    _aliases = {
        "len": "length",
        "sum": "arraySum",
        "avg": "arrayAvg",
        "min": "arrayMin",
        "max": "arrayMax",
        "sort": "arraySort",
        "distinct": "arrayDistinct",
        "reverse": "arrayReverse",
        "join": "arrayStringConcat",
        "contains": "has",
        "index_of": "indexOf",
        "flatten": "arrayFlatten",
        "compact": "arrayCompact",
        "slice": "arraySlice",
        "concat": "arrayConcat",
        "uniq": "arrayUniq",
    }

    def __getitem__(self, index: int) -> ColumnExpr:
        idx = index + 1 if index >= 0 else index
        return wrap(F.element_at(self._col, idx))


class JsonAccessor(BaseAccessor):
    """``.json`` — reference accessors/json.py:16."""

    _aliases = {
        "extract_string": "JSONExtractString",
        "extract_int": "JSONExtractInt",
        "extract_float": "JSONExtractFloat",
        "extract_bool": "JSONExtractBool",
        "extract_raw": "JSONExtractRaw",
        "keys": "JSONExtractKeys",
        "has": "JSONHas",
        "len": "JSONLength",
        "length": "JSONLength",
        "type": "JSONType",
        "is_valid": "isValidJSON",
    }


class UrlAccessor(BaseAccessor):
    """``.url`` — reference accessors/url.py:16."""

    _aliases = {
        "host": "domain",
        "tld": "topLevelDomain",
        "param": "extractURLParameter",
        "params": "extractURLParameters",
        "query": "queryString",
        "decode": "decodeURLComponent",
        "encode": "encodeURLComponent",
    }


class IpAccessor(BaseAccessor):
    """``.ip`` — reference accessors/ip.py:16."""

    _aliases = {
        "to_string": "IPv4NumToString",
        "to_num": "IPv4StringToNum",
        "is_ipv4": "isIPv4String",
        "is_ipv6": "isIPv6String",
    }


class GeoAccessor(BaseAccessor):
    """``.geo`` — reference accessors/geo.py:16. Distance/vector functions
    take the partner column as the first argument."""

    _aliases = {
        "distance": "greatCircleDistance",
        "cosine_distance": "cosineDistance",
        "dot": "dotProduct",
        "l2_norm": "L2Norm",
        "l1_norm": "L1Norm",
        "normalize": "L2Normalize",
    }
