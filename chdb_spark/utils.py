"""``chdb.utils`` analogue — type inference, dict flattening, columnar
conversion, type mapping, and query tracing (reference docs/utils.rst; the
module ships in the upstream chdb wheel the reference layers over, and
``chdb/__init__.py:236`` re-exports it as ``chdb.utils``).

Everything here is driver-side helper code (it shapes small Python payloads
before they become DataFrames) — nothing touches executors.
"""

from __future__ import annotations

import time
from datetime import date, datetime
from types import SimpleNamespace
from typing import Any

__all__ = [
    "flatten_dict",
    "convert_to_columnar",
    "infer_data_type",
    "infer_data_types",
    "types",
    "trace",
]


# ---------------------------------------------------------------------------
# dict flattening / columnar conversion (docs/utils.rst "Data Processing")
# ---------------------------------------------------------------------------


def flatten_dict(d: dict, parent_key: str = "", sep: str = ".") -> dict:
    """Flatten nested dictionaries into dot-joined keys
    (docs/utils.rst:26-55). Lists of dicts flatten per-index
    (``key.0.sub``); scalar lists pass through unchanged."""
    out: dict[str, Any] = {}
    for k, v in d.items():
        key = f"{parent_key}{sep}{k}" if parent_key else str(k)
        if isinstance(v, dict):
            out.update(flatten_dict(v, key, sep))
        elif isinstance(v, list) and any(isinstance(x, dict) for x in v):
            for i, x in enumerate(v):
                if isinstance(x, dict):
                    out.update(flatten_dict(x, f"{key}{sep}{i}", sep))
                else:
                    out[f"{key}{sep}{i}"] = x
        else:
            out[key] = v
    return out


def convert_to_columnar(rows: list[dict], sep: str = ".") -> dict[str, list]:
    """Row dicts → column lists (docs/utils.rst:60-76). Rows are flattened
    first; missing keys become None so every column has equal length."""
    if not rows:
        return {}
    flat = [flatten_dict(r, sep=sep) for r in rows]
    cols: list[str] = []
    for r in flat:
        for k in r:
            if k not in cols:
                cols.append(k)
    return {c: [r.get(c) for r in flat] for c in cols}


# ---------------------------------------------------------------------------
# type inference (docs/utils.rst "Data Type Inference")
# ---------------------------------------------------------------------------


def infer_data_type(values) -> str:
    """ClickHouse type name for a list of Python values
    (docs/utils.rst:79-91: ints → UInt64/Int64, floats → Float64,
    strings → String, bools → Bool; anything mixed/unknown → String)."""
    non_null = [v for v in values if v is not None]
    if not non_null:
        return "String"
    if all(isinstance(v, bool) for v in non_null):
        return "Bool"
    if all(isinstance(v, int) and not isinstance(v, bool) for v in non_null):
        return "UInt64" if all(v >= 0 for v in non_null) else "Int64"
    if all(
        isinstance(v, (int, float)) and not isinstance(v, bool) for v in non_null
    ):
        return "Float64"
    if all(isinstance(v, datetime) for v in non_null):
        return "DateTime"
    if all(isinstance(v, date) for v in non_null):
        return "Date"
    if all(isinstance(v, str) for v in non_null):
        return "String"
    return "String"


def infer_data_types(data: dict[str, list]) -> dict[str, str]:
    """Per-column type inference (docs/utils.rst:95-110)."""
    return {col: infer_data_type(vals) for col, vals in data.items()}


# ---------------------------------------------------------------------------
# chdb.utils.types — Python <-> ClickHouse type mapping
# ---------------------------------------------------------------------------

_PY_TO_CH = {
    int: "Int64",
    float: "Float64",
    str: "String",
    bool: "Bool",
    bytes: "String",
    datetime: "DateTime",
    date: "Date",
    list: "Array(String)",
    tuple: "Tuple()",
    dict: "Map(String, String)",
}

_CH_TO_PY = {
    "string": str,
    "fixedstring": str,
    "uuid": str,
    "ipv4": str,
    "ipv6": str,
    "json": str,
    "bool": bool,
    "boolean": bool,
    "float32": float,
    "float64": float,
    "date": date,
    "date32": date,
    "datetime": datetime,
    "datetime64": datetime,
}


def _python_to_clickhouse(py_type) -> str:
    try:
        return _PY_TO_CH[py_type]
    except KeyError:
        raise ValueError(f"no ClickHouse mapping for Python type {py_type!r}")


def _clickhouse_to_python(ch_type: str):
    base = ch_type.strip()
    low = base.lower()
    if low.startswith("nullable(") and base.endswith(")"):
        return _clickhouse_to_python(base[9:-1])
    if low.startswith("lowcardinality(") and base.endswith(")"):
        return _clickhouse_to_python(base[15:-1])
    if low.startswith("array"):
        return list
    if low.startswith("tuple"):
        return tuple
    if low.startswith("map"):
        return dict
    if low.startswith("decimal"):
        import decimal

        return decimal.Decimal
    head = low.split("(")[0]
    if head in _CH_TO_PY:
        return _CH_TO_PY[head]
    if head.startswith(("uint", "int")):
        return int
    if head.startswith("float"):
        return float
    if head.startswith("datetime"):
        return datetime
    raise ValueError(f"unknown ClickHouse type: {ch_type!r}")


types = SimpleNamespace(
    python_to_clickhouse=_python_to_clickhouse,
    clickhouse_to_python=_clickhouse_to_python,
)


# ---------------------------------------------------------------------------
# chdb.utils.trace — query tracing (docs/utils.rst "Tracing and Debugging")
# ---------------------------------------------------------------------------


class _Trace:
    """enable_trace()/get_trace()/disable_trace(): record every
    ``session.query`` execution (sql, elapsed seconds, result rows) while
    enabled. Zero overhead when disabled (one attribute check)."""

    def __init__(self) -> None:
        self.enabled = False
        self._events: list[dict] = []

    def enable_trace(self) -> None:
        self.enabled = True
        self._events = []

    def disable_trace(self) -> None:
        self.enabled = False

    def get_trace(self) -> list[dict]:
        return list(self._events)

    def _record(self, sql: str, elapsed: float, rows: int) -> None:
        if self.enabled:
            self._events.append(
                {"sql": sql, "elapsed": elapsed, "rows": rows, "ts": time.time()}
            )


trace = _Trace()


def values_relation(spark, rows, cols):
    """Driver rows → a TRUE LocalRelation via an inline VALUES table.

    PySpark's ``createDataFrame(list)`` parallelizes through an RDD —
    its ``collect()`` schedules a job (~0.3 s measured on 20 rows).
    ``VALUES`` parses to a LocalRelation, so Catalyst folds projections
    into it and ``collect()`` runs driver-side with zero tasks (45 ms
    measured, same rows). Every literal is CAST to its column type
    (bare SQL decimal literals would otherwise type as DECIMAL, and
    ints as INT); float literals render via ``repr`` — the shortest
    round-trip decimal, which Spark's decimal-parse + cast-to-double
    maps back to the identical double. Only for SMALL row sets (the
    caller bounds them — SQL text scales with rows)."""
    if not rows:
        return spark.createDataFrame(
            [], ", ".join(f"{n} {t}" for n, t in cols)
        )
    vals = ",".join(
        "("
        + ",".join(
            f"CAST(NULL AS {t})" if v is None else f"CAST({v!r} AS {t})"
            for v, (_n, t) in zip(row, cols)
        )
        + ")"
        for row in rows
    )
    names = ", ".join(f"col{i + 1} AS {n}" for i, (n, _t) in enumerate(cols))
    return spark.sql(f"SELECT {names} FROM VALUES {vals}")
